"""Checkpoint save/load (orbax).

Rebuild of the reference checkpoint contract (reference: mmcv CheckpointHook
— epoch_N + latest each epoch embedding meta {epoch, iter, CLASSES, config};
``resume_from`` restores model+optimizer+progress, ``load_from`` weights only
— apis/train.py:139-142, SURVEY.md §5)."""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(work_dir: str, state, epoch: int,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Write ``epoch_{N}`` + refresh ``latest`` pointer.

    Multi-process: EVERY process calls orbax (its checkpointer runs its own
    cross-process barriers and writes each array from its primary replica
    only — skipping ranks here deadlocks those barriers); the small
    meta/latest sidecar files are rank-0-only (the reference
    CheckpointHook's master_only rule)."""
    path = osp.abspath(osp.join(work_dir, f'epoch_{epoch}'))
    ocp = _ocp()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    if jax.process_count() == 1 or jax.process_index() == 0:
        meta = dict(meta or {})
        meta['epoch'] = epoch
        meta['step'] = int(jax.device_get(state.step))
        with open(osp.join(work_dir, f'epoch_{epoch}.meta.json'), 'w') as f:
            json.dump(meta, f)
        with open(osp.join(work_dir, 'latest'), 'w') as f:
            f.write(f'epoch_{epoch}')
    if jax.process_count() > 1:
        # barrier AFTER the rank-0 sidecar writes: without it a peer can
        # return, resolve 'latest' immediately and miss the pointer (the
        # multihost test needed a poll loop to paper over exactly this)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f'ckpt_meta_epoch_{epoch}')
    return path


def load_checkpoint(path: str, target_state):
    """Restore a TrainState written by :func:`save_checkpoint`.

    ``path`` may be a direct epoch dir or a work_dir containing ``latest``.
    """
    ocp = _ocp()
    path = _resolve_ckpt_path(osp.abspath(path))
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(path, target=jax.device_get(target_state))
    meta_path = path + '.meta.json'
    meta = {}
    if osp.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def _resolve_ckpt_path(path: str) -> str:
    """Accept a work_dir (-> its 'latest'), the 'latest' pointer FILE
    itself, or a direct epoch dir."""
    if osp.isfile(osp.join(path, 'latest')):
        with open(osp.join(path, 'latest')) as f:
            return osp.join(path, f.read().strip())
    if osp.isfile(path):  # the pointer file: resolve relative to its dir
        with open(path) as f:
            return osp.join(osp.dirname(path), f.read().strip())
    return path


def load_params_only(path: str, target_params):
    """``load_from`` semantics: weights only, progress reset."""
    ocp = _ocp()
    path = _resolve_ckpt_path(osp.abspath(path))
    ckpt = ocp.StandardCheckpointer()
    meta = ckpt.metadata(path)
    restored = ckpt.restore(path)
    # restored is the full TrainState dict; pull params/batch_stats
    if isinstance(restored, dict) and 'params' in restored:
        return restored['params'], restored.get('batch_stats', {})
    return restored, {}
