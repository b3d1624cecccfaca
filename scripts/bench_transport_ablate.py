"""Transport-stage cost model (VERDICT r4 #7): per-component ablation of
the fit_and_transport_batched program at the bench workload (E=16384,
N=20, Q=400, D=2) on the real TPU chip.

Stages timed (each its own jitted program, timed with the async-queue +
single-scalar-sync recipe):
  full        — the bench program (baseline ~38 ms/batch)
  fit_only    — Kabsch + E-last chol/inverse + alpha (no queries)
  mean_std    — fit + posterior mean/std (no Jacobian path)
  no_det      — full minus the J_Φ det diagnostic
  merged      — full with the two GEMM pairs merged: [alpha | K_inv] ⊗ kT
                and [alpha | K_inv] ⊗ dkT as ONE batched GEMM each
                (halves the kT/dkT read passes; epilogues unchanged)

Also prints an HBM-traffic model per stage (bytes of big intermediates)
so the ms can be attributed HBM-vs-MXU-vs-dispatch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.transport import gpt as gpt_mod
from gaussian_process_transportation_tpu.models import affine as affine_core
from gaussian_process_transportation_tpu.models import exact_gp as gp_core

E = int(os.environ.get("E", "16384"))
ITERS = int(os.environ.get("ITERS", "10"))
HI = jax.lax.Precision.HIGHEST

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import make_workload  # noqa: E402

X, dX, S, S1 = make_workload()
kernel = K.Constant(10.0) * K.RBF(4.0 * jnp.ones(2, jnp.float32)) + K.White(0.01)
Xd, dXd, Sd = jnp.asarray(X), jnp.asarray(dX), jnp.asarray(S)
shifts = jnp.linspace(0.0, 1.0, E, dtype=jnp.float32)
targets = jnp.asarray(S1)[None] + shifts[:, None, None]
n, d = S.shape
Q = X.shape[0]

print(f"E={E} N={n} Q={Q} D={d} backend={jax.default_backend()}", flush=True)


def _fit(tgts):
    """Shared fit stage: Kabsch + E-last chol/inv + alpha (gpt.py:305-322)."""
    aff_b = affine_core.fit_batched(Sd, tgts, do_scale=False, do_rotation=True)
    src_al = jax.vmap(lambda a: affine_core.predict(a, Sd))(aff_b)
    delta_b = tgts - src_al
    K_b = jax.vmap(kernel)(src_al)
    eff = gp_core._eff_jitter(src_al.dtype, 1e-10)
    K_b = K_b + eff * jnp.eye(n, dtype=src_al.dtype)
    from gaussian_process_transportation_tpu.ops.batched_linalg import (
        spd_inverse_elast,
    )

    L_e, Kinv_e = spd_inverse_elast(jnp.transpose(K_b, (1, 2, 0)))
    L_b = jnp.transpose(L_e, (2, 0, 1))
    Kinv_b = jnp.transpose(Kinv_e, (2, 0, 1))
    alpha_b = jnp.einsum("enm,emp->enp", Kinv_b, delta_b, precision=HI)
    return aff_b, src_al, delta_b, L_b, alpha_b, Kinv_b


def full(tgts):
    return gpt_mod.fit_and_transport_batched(kernel, Sd, tgts, Xd, dXd)


def fit_only(tgts):
    aff_b, src_al, delta_b, L_b, alpha_b, Kinv_b = _fit(tgts)
    return alpha_b


def mean_std(tgts):
    aff_b, src_al, delta_b, L_b, alpha_b, Kinv_b = _fit(tgts)

    def apply_one(aff, Xs, alpha, K_inv):
        pos = affine_core.predict(aff, Xd)
        kT = kernel(Xs, pos)
        meanT = jnp.einsum("np,nq->pq", alpha, kT, precision=HI)
        KiK = jnp.dot(K_inv, kT, precision=HI)
        var = kernel.diag(pos) - jnp.sum(KiK * kT, axis=0)
        std_q = jnp.sqrt(jnp.maximum(var, 0.0))
        return pos + meanT.T, std_q

    return jax.vmap(apply_one)(aff_b, src_al, alpha_b, Kinv_b)


def no_det(tgts):
    aff_b, src_al, delta_b, L_b, alpha_b, Kinv_b = _fit(tgts)

    def apply_one(aff, Xs, alpha, K_inv):
        pos = affine_core.predict(aff, Xd)
        Jg = (aff.scale * aff.rotation).astype(pos.dtype)
        kT = kernel(Xs, pos)
        meanT = jnp.einsum("np,nq->pq", alpha, kT, precision=HI)
        KiK = jnp.dot(K_inv, kT, precision=HI)
        var = kernel.diag(pos) - jnp.sum(KiK * kT, axis=0)
        std_q = jnp.sqrt(jnp.maximum(var, 0.0))
        dkT = kernel.dxT(pos, Xs)
        JpsiT = jnp.einsum("np,dnq->pdq", alpha, dkT, precision=HI)
        KidkT = jnp.einsum("nm,dmq->dnq", K_inv, dkT, precision=HI)
        quadT = jnp.sum(KidkT * dkT, axis=1)
        JvarT = kernel.dxdz_diag(pos).T - quadT
        wT = jnp.dot(Jg, dXd.T, precision=HI)
        delta_newT = wT + jnp.einsum("pdq,dq->pq", JpsiT, wT, precision=HI)
        dvar_q = jnp.einsum("dq,dq->q", JvarT, wT**2, precision=HI)
        return pos + meanT.T, std_q, delta_newT.T, dvar_q

    return jax.vmap(apply_one)(aff_b, src_al, alpha_b, Kinv_b)


def merged(tgts):
    aff_b, src_al, delta_b, L_b, alpha_b, Kinv_b = _fit(tgts)
    AK_b = jnp.concatenate([alpha_b, Kinv_b], axis=2)  # (E, n, P+n)

    def apply_one(aff, Xs, AK):
        pos = affine_core.predict(aff, Xd)
        Jg = (aff.scale * aff.rotation).astype(pos.dtype)
        kT = kernel(Xs, pos)  # (n, Q)
        both = jnp.einsum("nr,nq->rq", AK, kT, precision=HI)  # (P+n, Q)
        meanT, KiK = both[:d], both[d:]
        var = kernel.diag(pos) - jnp.sum(KiK * kT, axis=0)
        std_q = jnp.sqrt(jnp.maximum(var, 0.0)) - jnp.sqrt(
            gp_core.white_noise_level(kernel)
        )
        traj_new = pos + meanT.T
        dkT = kernel.dxT(pos, Xs)  # (D, n, Q)
        bothd = jnp.einsum("nr,dnq->rdq", AK, dkT, precision=HI)  # (P+n, D, Q)
        JpsiT, KidkT = bothd[:d], jnp.moveaxis(bothd[d:], 0, 1)  # (P,D,Q), (D,n,Q)
        quadT = jnp.sum(KidkT * dkT, axis=1)
        JvarT = kernel.dxdz_diag(pos).T - quadT
        JphiT = Jg[:, :, None] + jnp.einsum("peq,ed->pdq", JpsiT, Jg, precision=HI)
        Jphi = jnp.moveaxis(JphiT, -1, 0)
        min_abs_det = jnp.min(jnp.abs(gpt_mod._det_small(Jphi)))
        wT = jnp.dot(Jg, dXd.T, precision=HI)
        delta_newT = wT + jnp.einsum("pdq,dq->pq", JpsiT, wT, precision=HI)
        dvar_q = jnp.einsum("dq,dq->q", JvarT, wT**2, precision=HI)
        return traj_new, std_q, delta_newT.T, dvar_q, min_abs_det

    return jax.vmap(apply_one)(aff_b, src_al, AK_b)


def _sync(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    s = sum(jnp.sum(l[(0,) * l.ndim]).astype(jnp.float32) for l in leaves)
    np.asarray(s)


def timed(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(targets)
    _sync(out)
    compile_s = time.perf_counter() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(targets)
        _sync(out)
        reps.append((time.perf_counter() - t0) / ITERS)
    dt = float(np.median(reps)) * 1e3
    print(f"{name:10s}: {dt:7.2f} ms/batch  ({E/np.median(reps)/1e3:7.1f}k traj/s)"
          f"  [compile {compile_s:.0f}s, reps {[f'{r*1e3:.1f}' for r in reps]}]",
          flush=True)
    return dt, out


t_full, out_full = timed("full", full)
t_fit, _ = timed("fit_only", fit_only)
t_ms, _ = timed("mean_std", mean_std)
t_nd, _ = timed("no_det", no_det)
t_mg, out_mg = timed("merged", merged)

# numeric equivalence of the merged formulation
ref = full(targets)
a = np.asarray(ref.traj[:8])
b = np.asarray(out_mg[0][:8])
print(f"merged vs full traj max err: {np.abs(a - b).max():.2e}", flush=True)
dv_a = np.asarray(ref.delta[:8])
dv_b = np.asarray(out_mg[2][:8])
print(f"merged vs full delta max err: {np.abs(dv_a - dv_b).max():.2e}", flush=True)

f32 = 4
big = {
    "kT": E * n * Q * f32,
    "KiK": E * n * Q * f32,
    "dkT": E * d * n * Q * f32,
    "KidkT": E * d * n * Q * f32,
    "outputs": 4 * E * Q * d * f32,
}
print("traffic model (write-once bytes): "
      + ", ".join(f"{k}={v/1e6:.0f}MB" for k, v in big.items()), flush=True)
print(f"jacobian path = full - mean_std = {t_nd - t_ms:.1f} ms; "
      f"det diagnostic = {t_full - t_nd:.1f} ms; "
      f"queries = full - fit = {t_full - t_fit:.1f} ms; "
      f"merged saves {t_full - t_mg:.1f} ms", flush=True)
