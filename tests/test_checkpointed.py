"""Elastic recovery: checkpointed HMC resumes bit-identically
(SURVEY.md §5 failure-detection row; closes the r1 'nothing built' gap)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_process_transportation_tpu.parallel import samplers
from gaussian_process_transportation_tpu.parallel.checkpointed import (
    run_hmc_checkpointed,
)


def _logprob(q):
    return -0.5 * jnp.sum(q**2) - 0.1 * jnp.sum(q**4)


def _inits(C=4, D=3):
    return jnp.asarray(np.random.RandomState(0).randn(C, D) * 0.5)


COMMON = dict(num_warmup=40, num_samples=60, num_leapfrog=8)


def test_segmented_matches_monolithic(tmp_path):
    """Same PRNG stream as hmc(); only XLA fusion noise (amplified by the
    chaotic leapfrog) separates different-jit-boundary programs — bitwise
    equality across IDENTICAL segmenting is asserted in the resume test."""
    inits = _inits()
    key = jax.random.PRNGKey(7)

    mono = jax.vmap(
        lambda q0, k: samplers.hmc(_logprob, q0, k, **COMMON)[0]
    )(inits, jax.random.split(key, inits.shape[0]))

    seg, _ = run_hmc_checkpointed(
        _logprob, inits, key, str(tmp_path / "run"), segment=25, **COMMON
    )
    assert np.allclose(np.asarray(seg), np.asarray(mono), atol=1e-2), np.abs(
        np.asarray(seg) - np.asarray(mono)
    ).max()


def test_resume_after_kill(tmp_path):
    """Simulate preemption: run only the warmup+first segment (by a
    truncated num_samples trick we instead interrupt by running a partial
    helper), then a NEW process-like call must pick up the checkpoint and
    produce the identical final stream."""
    inits = _inits()
    key = jax.random.PRNGKey(7)
    path = str(tmp_path / "run")

    # full uninterrupted reference with the SAME segmenting (bit-identical
    # programs; only the kill/restart differs)
    full, _ = run_hmc_checkpointed(
        _logprob, inits, key, str(tmp_path / "ref"), segment=20, **COMMON
    )

    # "crashed" run: monkey-set segment so only one segment completes, by
    # calling with num_samples=20 first... instead simply run the real API
    # with segment=20 but stop after the first save by raising from a
    # wrapped dynamic_update_slice? Simplest honest kill: run a copy with
    # num_samples=20 (writes a checkpoint with done=20 and a short buffer),
    # then rewrite the buffer length by re-saving — exercised through the
    # public API below instead:
    # first call: completes 20 of 60 by segment carving
    import gaussian_process_transportation_tpu.parallel.checkpointed as cp

    orig_save = cp._save
    calls = {"n": 0}

    def killing_save(*a, **kw):
        orig_save(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 2:  # after warmup ckpt + first segment ckpt
            raise KeyboardInterrupt("simulated preemption")

    cp._save = killing_save
    try:
        run_hmc_checkpointed(_logprob, inits, key, path, segment=20, **COMMON)
        raise AssertionError("expected simulated preemption")
    except KeyboardInterrupt:
        pass
    finally:
        cp._save = orig_save

    meta_done = 20
    assert os.path.exists(path + ".ckpt.npz")

    # restart: must resume from done=20 and finish identically
    resumed, _ = run_hmc_checkpointed(
        _logprob, inits, key, path, segment=20, **COMMON
    )
    assert np.array_equal(np.asarray(resumed), np.asarray(full))
