"""Failure detection / elastic recovery for long sampler runs.

The reference has no failure handling at all (SURVEY.md §5: the nearest
analog is try/except around pickle loads, ``tag_detector.py:140-151``).
Long pod-scale sampling jobs need better: a preempted or crashed run must
resume WITHOUT re-burning the warmup and without perturbing the sample
stream.

``run_hmc_checkpointed`` runs vmapped HMC chains in segments, persisting
(chain state, tuned step sizes/mass, samples so far) to the artifact store
after every segment.  Because :func:`samplers.hmc_sample_range` slices the
per-step keys out of the ONE key array :func:`samplers.hmc` would use, a
run that is killed and restarted produces bit-identical samples to an
uninterrupted one — tested in ``tests/test_checkpointed.py``.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.artifacts import load_metadata, load_pytree, save_pytree
from .samplers import HMCState, hmc_sample_range, hmc_warmup

Array = jax.Array


def _ckpt_path(path: str) -> str:
    return path + ".ckpt"


def run_hmc_checkpointed(
    logprob_fn: Callable[[Array], Array],
    init_positions: Array,  # (C, D) chain starts
    key: Array,
    path: str,
    num_warmup: int = 300,
    num_samples: int = 300,
    segment: int = 100,
    num_leapfrog: int = 16,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
) -> Tuple[Array, dict]:
    """Vmapped multi-chain HMC with segment checkpoints at ``path``.

    On a fresh start: warmup runs once and is checkpointed.  On restart
    (checkpoint file exists): warmup and all completed segments are loaded
    and sampling continues from the next segment.  Returns
    (samples (C, num_samples, D), info).  Delete the checkpoint files to
    force a fresh run.
    """
    C, D = init_positions.shape
    chain_keys = jax.random.split(key, C)
    ckpt = _ckpt_path(path)

    template = {
        "position": jnp.zeros((C, D)),
        "log_prob": jnp.zeros((C,)),
        "grad": jnp.zeros((C, D)),
        "step_size": jnp.zeros((C,)),
        "inv_mass": jnp.zeros((C, D)),
        "samples": jnp.zeros((C, num_samples, D)),
    }

    done = 0
    if os.path.exists(ckpt + ".npz"):
        done = int(load_metadata(ckpt)["done"])
        saved = load_pytree(ckpt, template)
        state = HMCState(saved["position"], saved["log_prob"], saved["grad"])
        step_size, inv_mass = saved["step_size"], saved["inv_mass"]
        samples = saved["samples"]
    else:
        warm = jax.jit(
            jax.vmap(
                lambda q0, k: hmc_warmup(
                    logprob_fn, q0, k, num_warmup, num_leapfrog,
                    initial_step_size, target_accept,
                )
            )
        )
        state, step_size, inv_mass = warm(init_positions, chain_keys)
        samples = template["samples"]
        _save(ckpt, state, step_size, inv_mass, samples, done=0)

    def seg_fn(start, stop):
        return jax.jit(
            jax.vmap(
                lambda st, k, ss, im: hmc_sample_range(
                    logprob_fn, st, k, num_samples, start, stop, ss, im,
                    num_leapfrog,
                )
            ),
        )

    while done < num_samples:
        stop = min(done + segment, num_samples)
        state, seg_samples, _ = seg_fn(done, stop)(
            state, chain_keys, step_size, inv_mass
        )
        samples = jax.lax.dynamic_update_slice(
            samples, seg_samples, (0, done, 0)
        )
        done = stop
        _save(ckpt, state, step_size, inv_mass, samples, done=done)

    info = dict(step_size=step_size, inv_mass=inv_mass)
    return samples, info


def _save(ckpt, state, step_size, inv_mass, samples, done: int):
    save_pytree(
        ckpt,
        {
            "position": state.position,
            "log_prob": state.log_prob,
            "grad": state.grad,
            "step_size": step_size,
            "inv_mass": inv_mass,
            "samples": samples,
        },
        metadata={"done": done},
    )
