#!/usr/bin/env python
"""Export a detector's inference function as a serialized StableHLO
artifact via ``jax.export`` — the TPU-native counterpart of the
reference's ONNX export (reference: tools/pytorch2onnx.py:1-166; ONNX is
a CUDA/TensorRT deployment path, StableHLO is the XLA one: the artifact
reloads with ``jax.export.deserialize`` and runs under ``jax.jit`` on any
XLA backend/version within the compatibility window).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?')
    p.add_argument('--out', default='model.stablehlo')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344],
                   help='input canvas (h, w)')
    p.add_argument('--batch', type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.inference import init_detector

    cfg = Config.fromfile(args.config)
    model = init_detector(cfg, args.checkpoint)
    det, variables = model.det, model.variables
    h, w = args.shape
    b = args.batch

    def fwd(image, img_shape, scale_factor):
        batch = {'image': image, 'img_shape': img_shape,
                 'scale_factor': scale_factor}
        return det.apply(variables, batch, method='simple_test')

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.float32))
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'exported {len(blob) / 1e6:.1f} MB StableHLO -> {args.out}')
    print('reload with: jax.export.deserialize(open(path, "rb").read())'
          '.call(image, img_shape, scale_factor)')


if __name__ == '__main__':
    main()
