"""Conv+BN folding for inference.

Rebuild of the reference ``tools/fuse_conv_bn.py`` (reference:
tools/fuse_conv_bn.py:fuse_conv_bn/fuse_module): fold each BatchNorm's
frozen statistics and affine transform into the preceding convolution's
kernel and bias, then neutralize the BN (scale=1, bias=0, mean=0, var=1)
so the module graph is unchanged but the normalization is a no-op XLA
folds away.

The flax convention in this codebase pairs ``convX``/``bnX`` and
``downsample_conv``/``downsample_bn`` inside the same module dict
(models/resnet.py, models/hrnet.py), with kernels HWIO and BN stats in the
``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


_PAIR_SUFFIX = {'conv': 'bn'}


def _bn_name_for(conv_name: str):
    """convN -> bnN, downsample_conv -> downsample_bn, conv -> bn."""
    if conv_name.endswith('_conv'):
        return conv_name[:-5] + '_bn'
    if conv_name.startswith('conv'):
        return 'bn' + conv_name[4:]
    return None


def fuse_conv_bn(variables: Dict, eps: float = 1e-5) -> Tuple[Dict, int]:
    """Returns (fused variables, number of fused pairs).

    w' = w * gamma / sqrt(var + eps)   (per output channel)
    b' = beta - mean * gamma / sqrt(var + eps)

    The scaled kernel replaces the conv kernel (BN-paired convs here are
    bias-free), and the additive term stays as the BN bias with the BN
    statistics neutralized (mean=0, var=1, scale=1) — the remaining BN is a
    pure per-channel add that XLA fuses into the conv epilogue.
    """
    import copy
    params = copy.deepcopy(
        {k: v for k, v in variables['params'].items()})
    stats = copy.deepcopy(
        {k: v for k, v in variables.get('batch_stats', {}).items()})
    count = [0]

    def walk(p: Dict, s: Dict):
        if not isinstance(p, dict):
            return
        for name in list(p.keys()):
            child = p[name]
            if not isinstance(child, dict):
                continue
            bn_name = _bn_name_for(name)
            if (bn_name and 'kernel' in child and bn_name in p
                    and isinstance(s, dict) and bn_name in s
                    and 'mean' in s[bn_name]):
                bn_p = p[bn_name]
                bn_s = s[bn_name]
                gamma = np.asarray(bn_p.get('scale', 1.0))
                beta = np.asarray(bn_p.get('bias', 0.0))
                mean = np.asarray(bn_s['mean'])
                var = np.asarray(bn_s['var'])
                # clamp: variances are >= 0 in any trained checkpoint, but a
                # malformed one must not silently poison the model with NaN
                factor = gamma / np.sqrt(np.maximum(var, 0.0) + eps)
                kernel = np.asarray(child['kernel'])
                child['kernel'] = jnp.asarray(
                    kernel * factor.reshape((1,) * (kernel.ndim - 1) + (-1,)),
                    dtype=kernel.dtype)
                conv_bias = np.asarray(child['bias']) if 'bias' in child \
                    else 0.0
                # the additive term remains as the (neutralized) BN's bias
                if 'scale' in bn_p:
                    bn_p['scale'] = jnp.ones_like(jnp.asarray(gamma))
                if 'bias' in bn_p:
                    bn_p['bias'] = jnp.asarray(
                        beta + (conv_bias - mean) * factor,
                        dtype=np.asarray(bn_p['bias']).dtype)
                if 'bias' in child:
                    child['bias'] = jnp.zeros_like(jnp.asarray(conv_bias))
                bn_s['mean'] = jnp.zeros_like(jnp.asarray(mean))
                bn_s['var'] = jnp.ones_like(jnp.asarray(var)) * (1.0 - eps)
                count[0] += 1
            else:
                walk(child, s.get(name, {}) if isinstance(s, dict) else {})

    walk(params, stats)
    out = dict(variables)
    out['params'] = params
    if 'batch_stats' in variables:
        out['batch_stats'] = stats
    return out, count[0]
