"""Real-hardware golden tier (VERDICT r3 #3): run with
``GPT_TPU_TESTS=1 python -m pytest tests/ -q -m tpu``.

The round-3 gap: a bf16-style numerics regression on the real chip would
only be caught by eye — the 421k-traj/s transport engine's on-chip
f32-vs-f64 accuracy, the HMC/SMC samplers, and the large-N fit step had
no committed hardware assertion.  Every test here computes its golden in
numpy float64 on the host (never importing /root/reference) and asserts
the TPU float32 output against it.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_transportation_tpu import kernels as K

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the real TPU backend"
)


def _np_resample(curve, num_points):
    curve = np.asarray(curve, np.float64)
    seg = np.linalg.norm(np.diff(curve, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    targets = np.linspace(0.0, cum[-1], num_points)
    return np.stack(
        [np.interp(targets, cum, curve[:, d]) for d in range(curve.shape[1])], axis=1
    )


def _workload_2d(n_traj=400, n_dist=20):
    ref = "/root/reference/example/2D/data/example.npz"
    if os.path.exists(ref):
        data = np.load(ref)
        X = _np_resample(data["demo"], n_traj)
        S = _np_resample(data["floor"], n_dist)
        S1 = _np_resample(data["newfloor"], n_dist)
    else:  # synthetic fallback, same scale
        t = np.linspace(0, 1, n_traj)
        X = np.stack([10 * t, 5 * np.sin(3 * t)], 1)
        s = np.linspace(0, 1, n_dist)
        S = np.stack([10 * s, -2 + 0 * s], 1)
        S1 = np.stack([10 * s, -2 + 3 * np.sin(2 * s)], 1)
    dX = np.zeros_like(X)
    dX[:-1] = np.diff(X, axis=0)
    return X, dX, S, S1


def _transport_golden_f64(X, dX, S, S1, amp=10.0, ls=4.0, noise=0.01,
                          jitter=1e-6):
    """The reference pipeline in f64 numpy (Kabsch + GP delta + velocity
    transport) — mirrors ``policy_transportation/models/gaussian_process.py``
    and ``gaussian_process_transportation.py`` math with fixed
    hyperparameters (the bench workload)."""
    cs, ct = S.mean(0), S1.mean(0)
    H = (S - cs).T @ (S1 - ct)
    U, _, Vt = np.linalg.svd(H)
    V = Vt.T
    R = V @ U.T
    if np.linalg.det(R) < 0:
        V[:, -1] *= -1
        R = V @ U.T
    gamma = lambda x: (R @ (x - cs).T).T + ct
    Sg = gamma(S)
    delta = S1 - Sg
    d2 = ((Sg[:, None, :] - Sg[None, :, :]) ** 2).sum(-1)
    Km = amp * np.exp(-0.5 * d2 / ls**2) + (noise + jitter) * np.eye(len(Sg))
    alpha = np.linalg.solve(Km, delta)
    Xg = gamma(X)
    d2s = ((Xg[:, None, :] - Sg[None, :, :]) ** 2).sum(-1)
    ks = amp * np.exp(-0.5 * d2s / ls**2)
    mean = ks @ alpha
    return Xg + mean


@requires_tpu
def test_transport_engine_f32_matches_f64_golden():
    """The headline engine: batched fit+transport at the bench workload;
    on-chip f32 vs host f64 — the builder-note 3.5e-4 claim, committed."""
    from gaussian_process_transportation_tpu.transport import gpt as gpt_mod

    X, dX, S, S1 = _workload_2d()
    kernel = K.Constant(10.0) * K.RBF(4.0 * jnp.ones(2, jnp.float32)) + K.White(0.01)
    E = 64
    shifts = np.linspace(0.0, 1.0, E)
    targets = jnp.asarray((S1[None] + shifts[:, None, None]).astype(np.float32))
    res = jax.jit(
        lambda tg: gpt_mod.fit_and_transport_batched(
            kernel, jnp.asarray(S, jnp.float32), tg,
            jnp.asarray(X, jnp.float32), jnp.asarray(dX, jnp.float32),
        )
    )(targets)
    traj = np.asarray(res.traj)
    assert np.isfinite(traj).all()
    scale = np.abs(X).max()
    for e in (0, E // 2, E - 1):
        golden = _transport_golden_f64(X, dX, S, S1 + shifts[e])
        err = np.abs(traj[e] - golden).max() / scale
        assert err < 1e-3, (e, err)  # measured 3.5e-4 on v5e-1


@requires_tpu
@pytest.mark.parametrize("family,nu", [("rbf", None), ("matern52", 2.5)])
def test_fused_predict_mean_on_tpu_vs_f64(family, nu):
    """Fused dense-grid mean at production tiles vs host f64."""
    from gaussian_process_transportation_tpu.ops.pallas_gram import (
        fused_gp_predict_mean,
    )

    rng = np.random.default_rng(0)
    N, Nq, D, P = 2048, 4096, 2, 2
    X = rng.standard_normal((N, D))
    Xq = rng.standard_normal((Nq, D))
    alpha = rng.standard_normal((N, P))
    ls, amp = 1.5, 2.0
    got = np.asarray(
        fused_gp_predict_mean(
            jnp.asarray(Xq, jnp.float32), jnp.asarray(X, jnp.float32),
            jnp.asarray(alpha, jnp.float32), jnp.asarray([ls, ls], jnp.float32),
            amp, interpret=False, family=family,
        )
    )
    d2 = ((Xq[:, None, :] / ls - X[None, :, :] / ls) ** 2).sum(-1)
    if family == "rbf":
        k = amp * np.exp(-0.5 * d2)
    else:
        r = np.sqrt(5.0 * d2)
        k = amp * (1 + r + r * r / 3.0) * np.exp(-r)
    golden = k @ alpha
    err = np.abs(got - golden).max() / np.abs(golden).max()
    assert err < 5e-5, err


@requires_tpu
@pytest.mark.parametrize("N", [2048, 4096])
def test_fused_predict_mean_var_on_tpu_vs_f64(N):
    """Fused dense-grid mean+VARIANCE (VERDICT r3 #5) vs host f64.

    N=4096 pins the fused-route admission boundary (exact_gp.py gate:
    ``gp.X.shape[0] <= 4096``), where the kernel's VMEM working set
    (~12.7 MB) runs closest to the 16 MB limit (ADVICE r4)."""
    from gaussian_process_transportation_tpu.models import exact_gp as core

    rng = np.random.default_rng(1)
    Nq, D = 10240, 2
    X = rng.standard_normal((N, D))
    Y = np.stack([np.sin(X[:, 0]), np.cos(X[:, 1])], 1)
    Xq = rng.standard_normal((Nq, D))
    amp, ls, noise = 2.0, 1.5, 0.05
    kern = K.Constant(amp) * K.RBF(ls * jnp.ones(D, jnp.float32)) + K.White(noise)
    gp = core.condition(
        kern, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        cache_k_inv=True,
    )
    mean, std = core.predict(gp, jnp.asarray(Xq, jnp.float32), return_std=True)
    mean, std = np.asarray(mean), np.asarray(std)

    jit = core._eff_jitter(jnp.float32, 1e-10)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    K64 = amp * np.exp(-0.5 * d2 / ls**2) + (noise + jit) * np.eye(N)
    d2s = ((Xq[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    ks = amp * np.exp(-0.5 * d2s / ls**2)
    alpha64 = np.linalg.solve(K64, Y)
    mean64 = ks @ alpha64
    var64 = (amp + noise) - np.einsum(
        "qn,qn->q", ks @ np.linalg.inv(K64), ks
    )
    std64 = np.sqrt(np.maximum(var64, 0.0))
    assert np.abs(mean - mean64).max() / np.abs(mean64).max() < 2e-3
    # vs f64 the std error is dominated by the f32 K⁻¹'s κ·eps conditioning
    # loss, which doubles with N (measured: 4e-3 at 2048, 9e-3 at 4096) —
    # the kernel itself is pinned by the same-precision XLA cross-check
    tol = 5e-3 if N <= 2048 else 1.5e-2
    assert np.abs(std[:, 0] - std64).max() / np.abs(std64).max() < tol
    # same-f32-inputs cross-check: fused kernel vs the XLA KiK path.  The
    # two differ only in f32 accumulation ORDER, but K⁻¹ entries are ~20
    # and the quad (≈2.0) cancels down to var ≈ 0.05, so ordering noise is
    # κ-amplified (measured 2e-3 abs at N=2048, 5e-3 at 4096); the gate
    # catches gross tile-indexing bugs (which produce O(1) errors), not fp
    # noise.
    k_star = gp.kernel(jnp.asarray(Xq, jnp.float32), gp.X)
    KiK = jnp.dot(k_star, gp.K_inv, precision=jax.lax.Precision.HIGHEST)
    var_x = gp.kernel.diag(jnp.asarray(Xq, jnp.float32)) - jnp.sum(
        KiK * k_star, axis=1
    )
    std_x = np.sqrt(np.maximum(np.asarray(var_x), 0.0))
    assert np.abs(std[:, 0] - std_x).max() < 2e-2 * std_x.max()


@requires_tpu
def test_hmc_fused_chain_moments_match_cpu_reference():
    """Short fused-path HMC on the chip vs the XLA reference chain on the
    host CPU — same target, moments within MC error (VERDICT r3 #1:
    'assert unchanged statistical quality')."""
    from gaussian_process_transportation_tpu.parallel import samplers

    rng = np.random.default_rng(0)
    n = 20
    Xs = rng.standard_normal((n, 2)).astype(np.float32)
    Ys = (np.sin(Xs[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    kernel = K.Constant(1.0) * K.RBF(jnp.ones(2, jnp.float32)) + K.White(0.01)
    common = dict(num_chains=64, num_warmup=200, num_samples=200)

    s_tpu, d_tpu = samplers.sample_gp_posterior(
        kernel, jnp.asarray(Xs), jnp.asarray(Ys), jax.random.PRNGKey(0), **common
    )
    s_tpu = np.asarray(s_tpu)
    assert np.isfinite(s_tpu).all()

    # independent reference chain through the pure-XLA ref implementation
    # (same target, no Pallas) — implementation-vs-implementation moments
    from gaussian_process_transportation_tpu.models.exact_gp import (
        small_lml_theta_layout,
    )
    layout = small_lml_theta_layout(kernel)
    bounds = kernel.theta_bounds
    s_cpu, _ = samplers._sample_gp_posterior_fused(
        kernel, jnp.asarray(Xs), jnp.asarray(Ys), jax.random.PRNGKey(1),
        layout, bounds[:, 0], bounds[:, 1],
        common["num_chains"], common["num_warmup"], common["num_samples"],
        None, 1e-10, use_kernel=False,
    )
    s_cpu = np.asarray(s_cpu)

    m_t = s_tpu.reshape(-1, 4).mean(0)
    m_c = s_cpu.reshape(-1, 4).mean(0)
    sd = s_cpu.reshape(-1, 4).std(0)
    assert np.all(np.abs(m_t - m_c) < 0.8 * sd + 0.3), (m_t, m_c, sd)


@requires_tpu
def test_smc_step_on_tpu_matches_f64_reweight():
    """One SMC reweight+resample at E=4096: log-weight update and ESS vs
    host f64; resampled particles are members of the input set."""
    from gaussian_process_transportation_tpu.parallel import smc

    rng = np.random.default_rng(2)
    E, T, D = 4096, 50, 2
    trajs = rng.standard_normal((E, T, D)).astype(np.float32)
    lw0 = np.full(E, -np.log(E), np.float32)
    particles = smc.ParticleEnsemble(
        trajectories=jnp.asarray(trajs), log_weights=jnp.asarray(lw0)
    )
    goal = jnp.asarray([1.0, 1.0], jnp.float32)
    ll_fn = smc.goal_likelihood(goal, scale=2.0)
    p1, ess = smc.smc_step(particles, ll_fn, jax.random.PRNGKey(0),
                           ess_threshold=0.0)  # no resample: check weights
    ll64 = -0.5 * ((trajs[:, -1, :].astype(np.float64)
                    - np.asarray(goal)) ** 2).sum(-1) / 2.0**2
    lw64 = lw0.astype(np.float64) + ll64
    lw64 = lw64 - np.log(np.exp(lw64 - lw64.max()).sum()) - lw64.max()
    got = np.asarray(p1.log_weights, np.float64)
    got = got - np.log(np.exp(got - got.max()).sum()) - got.max()
    assert np.abs(got - lw64).max() < 1e-3
    ess64 = 1.0 / np.exp(2 * lw64).sum() / E
    assert abs(float(ess) / E - ess64) < 1e-3 or abs(float(ess) - ess64 * E) < E * 1e-3

    # forced resample: every output trajectory is one of the inputs
    p2, _ = smc.smc_step(particles, ll_fn, jax.random.PRNGKey(1),
                         ess_threshold=1.0)
    out = np.asarray(p2.trajectories)
    idx = np.abs(out[:, 0, 0][:, None] - trajs[:, 0, 0][None, :]).argmin(1)
    assert np.abs(out - trajs[idx]).max() < 1e-6


@requires_tpu
def test_fit_ensemble_fused_on_tpu_improves_members():
    """Batched fused hyperopt on the chip: every member's fitted LML must
    beat its initial-kernel LML, and the fitted thetas must reproduce the
    reported LML on the host in f64."""
    from gaussian_process_transportation_tpu.models.exact_gp import (
        fit_ensemble_fused,
        log_marginal_likelihood,
    )

    rng = np.random.default_rng(5)
    E, n, D = 64, 20, 2
    Xe = rng.uniform(-2, 2, (E, n, D)).astype(np.float32)
    f = np.sin(1.3 * Xe[:, :, :1]) * np.cos(0.6 * Xe[:, :, 1:2])
    Ye = (f + 0.05 * rng.standard_normal((E, n, 1))).astype(np.float32)
    kernel = (
        K.Constant(1.0, bounds=(1e-2, 1e2))
        * K.RBF(jnp.ones(D, jnp.float32), bounds=(1e-1, 1e1))
        + K.White(0.2, bounds=(1e-4, 1.0))
    )
    thetas, lmls = fit_ensemble_fused(
        kernel, jnp.asarray(Xe), jnp.asarray(Ye), n_restarts=4, maxiter=30,
        key=jax.random.PRNGKey(0),
    )
    thetas, lmls = np.asarray(thetas), np.asarray(lmls)
    assert np.isfinite(thetas).all() and np.isfinite(lmls).all()
    import jax as _jax
    cpu = _jax.devices("cpu")[0]
    for e in range(0, E, 16):
        with _jax.default_device(cpu):
            x64 = jnp.asarray(Xe[e], jnp.float64)
            y64 = jnp.asarray(Ye[e], jnp.float64)
            lml0 = float(log_marginal_likelihood(kernel, x64, y64, 1e-10))
            lml_fit = float(
                log_marginal_likelihood(
                    kernel.with_theta(jnp.asarray(thetas[e], jnp.float64)),
                    x64, y64, 1e-10,
                )
            )
        assert lml_fit >= lml0 - 1e-3, (e, lml_fit, lml0)
        # the chip-reported LML agrees with the host-f64 recompute
        assert abs(lml_fit - float(lmls[e])) < 5e-2 * max(1.0, abs(lml_fit)), (
            e, lml_fit, float(lmls[e]))


@requires_tpu
def test_blocked_lml_grad_step_improves_at_n10240():
    """One gradient step of the panel LML at the full bench size N=10240
    increases the LML (the fit_blocked L-BFGS inner step, on hardware)."""
    from gaussian_process_transportation_tpu.ops.blocked_lml import (
        blocked_lml_value_and_grad,
    )

    rng = np.random.default_rng(3)
    N = 10240
    X = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((N, 1)).astype(np.float32))
    la = jnp.asarray(np.log(2.0), jnp.float32)
    ll = jnp.zeros(3, jnp.float32)
    ln = jnp.asarray(np.log(0.1), jnp.float32)
    v0, (ga, gl, gn) = jax.jit(
        lambda a, l, n_: blocked_lml_value_and_grad(
            X, Y, "rbf", a, l, n_, block=512,
            precision=jax.lax.Precision.HIGH,
        )
    )(la, ll, ln)
    g = np.concatenate([[float(ga)], np.asarray(gl), [float(gn)]])
    assert np.isfinite(float(v0)) and np.isfinite(g).all()
    lr = 1e-4 / max(1.0, np.abs(g).max())
    v1, _ = jax.jit(
        lambda a, l, n_: blocked_lml_value_and_grad(
            X, Y, "rbf", a, l, n_, block=512,
            precision=jax.lax.Precision.HIGH,
        )
    )(la + lr * float(ga), ll + lr * gl, ln + lr * float(gn))
    assert float(v1) > float(v0), (float(v0), float(v1))
