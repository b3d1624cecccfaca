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

``run_hmc_batched_checkpointed`` is the same guarantee for the fused
production sampler (:func:`samplers.hmc_batched`, the 169k-samples/s
ensemble-last path): its per-chain fold_in(chain_key, phase, step) key
discipline makes any [start, stop) segment draw the exact keys the
monolithic run would.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.artifacts import load_metadata, load_pytree, save_pytree
from .samplers import (
    HMCState,
    hmc_batched_sample_range,
    hmc_batched_warmup,
    hmc_sample_range,
    hmc_warmup,
)

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


def run_hmc_batched_checkpointed(
    lp_and_grad_batched: Callable[[Array], Tuple[Array, Array]],
    init_positions: Array,  # (T, E) ensemble-last chain starts
    key: Array,
    path: str,
    num_warmup: int = 300,
    num_samples: int = 300,
    segment: int = 100,
    num_leapfrog: int = 16,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    chain_keys: Optional[Array] = None,
) -> Tuple[Array, dict]:
    """Segment-checkpointed twin of :func:`samplers.hmc_batched` — the
    fused production sampler (ensemble-last lanes over a batched
    value+grad, e.g. ``ops.fused_lml.small_lml_value_grad``).

    Because every draw of step ``s`` derives from
    ``fold_in(fold_in(chain_keys[e], phase), s)`` (see
    :func:`samplers._batched_machinery`), a killed-and-restarted run
    produces bit-identical samples to an uninterrupted one — tested in
    ``tests/test_checkpointed.py::test_batched_resume_after_kill``.

    Returns (samples (E, num_samples, T), info) exactly like
    :func:`samplers.hmc_batched`.  Delete the checkpoint files to force a
    fresh run.
    """
    T, E = init_positions.shape
    if chain_keys is None:
        if key is None:
            raise ValueError("need either `key` or `chain_keys`")
        chain_keys = jax.random.split(key, E)
    ckpt = _ckpt_path(path)

    template = {
        "position": jnp.zeros((T, E)),
        "log_prob": jnp.zeros((E,)),
        "grad": jnp.zeros((T, E)),
        "step_size": jnp.zeros((E,)),
        "inv_mass": jnp.zeros((T, E)),
        "samples": jnp.zeros((E, num_samples, T)),
        "accept_sum": jnp.zeros((E,)),
    }

    done = 0
    if os.path.exists(ckpt + ".npz"):
        done = int(load_metadata(ckpt)["done"])
        saved = load_pytree(ckpt, template)
        state = (saved["position"], saved["log_prob"], saved["grad"])
        step_size, inv_mass = saved["step_size"], saved["inv_mass"]
        samples, accept_sum = saved["samples"], saved["accept_sum"]
    else:
        warm = jax.jit(
            lambda q0, cks: hmc_batched_warmup(
                lp_and_grad_batched, q0, cks, num_warmup, num_leapfrog,
                initial_step_size, target_accept,
            )
        )
        state, step_size, inv_mass = warm(init_positions, chain_keys)
        samples, accept_sum = template["samples"], template["accept_sum"]
        _save_batched(ckpt, state, step_size, inv_mass, samples, accept_sum,
                      done=0)

    def seg_fn(start, stop):
        return jax.jit(
            lambda st, cks, ss, im: hmc_batched_sample_range(
                lp_and_grad_batched, st, cks, start, stop, ss, im,
                num_leapfrog,
            )
        )

    while done < num_samples:
        stop = min(done + segment, num_samples)
        state, seg_samples, seg_accepts = seg_fn(done, stop)(
            state, chain_keys, step_size, inv_mass
        )
        samples = jax.lax.dynamic_update_slice(
            samples, seg_samples, (0, done, 0)
        )
        accept_sum = accept_sum + jnp.sum(seg_accepts, axis=0)
        done = stop
        _save_batched(ckpt, state, step_size, inv_mass, samples, accept_sum,
                      done=done)

    info = dict(
        step_size=step_size,
        inv_mass=jnp.transpose(inv_mass, (1, 0)),
        mean_accept=accept_sum / max(num_samples, 1),
    )
    return samples, info


def _save_batched(ckpt, state, step_size, inv_mass, samples, accept_sum,
                  done: int):
    save_pytree(
        ckpt,
        {
            "position": state[0],
            "log_prob": state[1],
            "grad": state[2],
            "step_size": step_size,
            "inv_mass": inv_mass,
            "samples": samples,
            "accept_sum": accept_sum,
        },
        metadata={"done": done},
    )
