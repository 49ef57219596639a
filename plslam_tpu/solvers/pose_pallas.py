"""Fused Pallas TPU kernel for motion-only pose optimization.

The jnp implementation (solvers/pose.py) traces the 4-round LM solve into
~500 tiny XLA kernels per call; with two solves per frame that is ~1000
device kernel launches at ~1 us busy + ~1 us inter-kernel gap each — the
single largest slice of the tracking step's 2.2 ms tail (device trace,
tools/profile_frame.py). This kernel runs the ENTIRE solve — residuals,
Jacobians, Huber weights, H/b accumulation, damped 6x6 solve, SE3 exp/compose
update, accept/reject, 4-round chi2 re-classification — as ONE kernel:

  * per-observation quantities live as [SUB, 128] f32 vector registers
    (N=1024 points -> 8 sublane rows; lines -> [L/128, 128]),
  * the pose, H (21 unique entries), b, and the LM state are SCALARS
    (SREGs), updated by fully unrolled scalar arithmetic,
  * the 6x6 damped solve is an unrolled LU (no pivoting: H + lam*I is SPD),
  * sin/cos/sqrt of the rotation angle are computed on a broadcast vector
    and read back through a VMEM scratch (Mosaic has no scalar
    transcendentals),
  * all rounds/iterations are statically unrolled (10 iterations total,
    schedule (4,2,2,2) — same semantics as the jnp path).

Replaces Optimizer::PoseOptimization (src/Optimizer.cc ~250) on the TPU hot
path; solvers/pose.py remains the CPU/test path and the oracle
(tests/test_pose.py asserts the two paths agree on the TPU runner).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plslam_tpu import constants as C

_TAU = 1e-5  # g2o OptimizationAlgorithmLevenberg initial lambda factor
_SMALL_THETA2 = 1e-3  # geometry/se3.py Taylor cutoff (f32 precision)


def _lu_solve6(H, b, lam):
    """Unrolled 6x6 LU solve of (H + lam*I) x = b on scalar values.

    H: list-of-lists [6][6] scalars, b: list [6]. No pivoting — the damped
    normal matrix is SPD whenever the system is non-degenerate; a degenerate
    system produces inf/nan, which the caller's isfinite accept-gate
    rejects (same behavior as jnp.linalg.solve on the XLA path)."""
    a = [[H[i][j] + (lam + 1e-9) * (1.0 if i == j else 0.0) for j in range(6)]
         for i in range(6)]
    x = list(b)
    for k in range(6):
        inv = 1.0 / a[k][k]
        for i in range(k + 1, 6):
            f = a[i][k] * inv
            for j in range(k + 1, 6):
                a[i][j] = a[i][j] - f * a[k][j]
            x[i] = x[i] - f * x[k]
    for k in range(5, -1, -1):
        s = x[k]
        for j in range(k + 1, 6):
            s = s - a[k][j] * x[j]
        x[k] = s / a[k][k]
    return x


def _kernel(rounds, iters_schedule, has_lines, sub, lsub,
            par_ref, xw_ref, obs_ref, w_ref, st_ref, val_ref,
            sw_ref, ew_ref, l2d_ref, wl_ref, lval_ref,
            pose_ref, pin_ref, lin_ref, vscr, rscr):
    f32 = jnp.float32
    fx, fy, cx, cy, bf = (par_ref[i] for i in range(5))
    pose = tuple(par_ref[5 + i] for i in range(12))  # r00..r22, tx, ty, tz

    X, Y, Z = xw_ref[0], xw_ref[1], xw_ref[2]  # [SUB, 128]
    ou, ov, our = obs_ref[0], obs_ref[1], obs_ref[2]
    wsig = w_ref[:]
    stereo = st_ref[:]
    valid = val_ref[:]
    delta2 = jnp.where(stereo > 0, f32(C.CHI2_STEREO), f32(C.CHI2_MONO))

    if has_lines:
        sX, sY, sZ = sw_ref[0], sw_ref[1], sw_ref[2]
        eX, eY, eZ = ew_ref[0], ew_ref[1], ew_ref[2]
        la, lb, lc = l2d_ref[0], l2d_ref[1], l2d_ref[2]
        wl = wl_ref[:]
        lvalid = lval_ref[:]

    def so3_coeffs(theta2):
        """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-safe.

        Computed on a broadcast [1, 128] vector (no scalar transcendentals
        in Mosaic), read back as scalars. Formulas mirror
        geometry/se3.py:_so3_coeffs."""
        t2v = jnp.full((1, 128), theta2, f32)
        small = t2v < _SMALL_THETA2
        t2s = jnp.where(small, 1.0, t2v)
        th = jnp.sqrt(t2s)
        sn, cs = jnp.sin(th), jnp.cos(th)
        Av = jnp.where(small, 1.0 - t2v / 6.0 + t2v * t2v / 120.0, sn / th)
        Bv = jnp.where(small, 0.5 - t2v / 24.0 + t2v * t2v / 720.0, (1.0 - cs) / t2s)
        Cv = jnp.where(
            small, 1.0 / 6.0 - t2v / 120.0 + t2v * t2v / 5040.0,
            (th - sn) / (t2s * th),
        )
        vscr[0:1, 0:128] = Av
        a = vscr[0, 0]
        vscr[0:1, 0:128] = Bv
        b = vscr[0, 0]
        vscr[0:1, 0:128] = Cv
        c = vscr[0, 0]
        return a, b, c

    def se3_exp_compose(d, T):
        """exp((rho, phi)) * T on scalar 12-tuples (geometry/se3.py exp)."""
        rho = d[0:3]
        p0, p1, p2 = d[3], d[4], d[5]
        theta2 = p0 * p0 + p1 * p1 + p2 * p2
        A, B, Cc = so3_coeffs(theta2)
        # K = hat(phi); K2 = K @ K
        z = p0 * 0.0
        K = [[z, -p2, p1], [p2, z, -p0], [-p1, p0, z]]
        K2 = [[sum(K[i][k] * K[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
        I3 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        R = [[I3[i][j] + A * K[i][j] + B * K2[i][j] for j in range(3)]
             for i in range(3)]
        V = [[I3[i][j] + B * K[i][j] + Cc * K2[i][j] for j in range(3)]
             for i in range(3)]
        t = [sum(V[i][k] * rho[k] for k in range(3)) for i in range(3)]
        # compose: R_new = R @ T.R, t_new = R @ T.t + t
        TR = [[T[3 * i + j] for j in range(3)] for i in range(3)]
        Tt = [T[9], T[10], T[11]]
        Rn = [[sum(R[i][k] * TR[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
        tn = [sum(R[i][k] * Tt[k] for k in range(3)) + t[i] for i in range(3)]
        return (Rn[0][0], Rn[0][1], Rn[0][2], Rn[1][0], Rn[1][1], Rn[1][2],
                Rn[2][0], Rn[2][1], Rn[2][2], tn[0], tn[1], tn[2])

    def pt_geom(T):
        """Camera-frame projection quantities at pose T (vectors)."""
        Px = T[0] * X + T[1] * Y + T[2] * Z + T[9]
        Py = T[3] * X + T[4] * Y + T[5] * Z + T[10]
        Pz = T[6] * X + T[7] * Y + T[8] * Z + T[11]
        ok = (Pz > 1e-3).astype(f32)
        iz = 1.0 / jnp.where(Pz > 1e-3, Pz, 1.0)
        return Px, Py, Pz, ok, iz

    def pt_chi2(T):
        Px, Py, Pz, ok, iz = pt_geom(T)
        u = fx * Px * iz + cx
        v = fy * Py * iz + cy
        ru = ou - u
        rv = ov - v
        rur = (our - (u - bf * iz)) * stereo
        chi2 = (ru * ru + rv * rv + rur * rur) * wsig
        return chi2, ok

    def ln_endpoint(T, Ex, Ey, Ez):
        Px = T[0] * Ex + T[1] * Ey + T[2] * Ez + T[9]
        Py = T[3] * Ex + T[4] * Ey + T[5] * Ez + T[10]
        Pz = T[6] * Ex + T[7] * Ey + T[8] * Ez + T[11]
        ok = (Pz > 1e-3).astype(f32)
        iz = 1.0 / jnp.where(Pz > 1e-3, Pz, 1.0)
        u = fx * Px * iz + cx
        v = fy * Py * iz + cy
        res = la * u + lb * v + lc
        return Px, Py, Pz, res, ok, iz

    def ln_chi2(T):
        _, _, _, rs, oks, _ = ln_endpoint(T, sX, sY, sZ)
        _, _, _, re, oke, _ = ln_endpoint(T, eX, eY, eZ)
        chi2 = (rs * rs + re * re) * wl
        return chi2, oks * oke

    def build(T, act, actl, robust):
        """-> (H [6][6] scalars, b [6] scalars, cost scalar)."""
        Px, Py, Pz, ok, iz = pt_geom(T)
        iz2 = iz * iz
        u = fx * Px * iz + cx
        v = fy * Py * iz + cy
        ru = ou - u
        rv = ov - v
        rur = (our - (u - bf * iz)) * stereo
        chi2 = (ru * ru + rv * rv + rur * rur) * wsig
        if robust:
            wh = jnp.where(
                chi2 <= delta2,
                1.0,
                jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)),
            )
            rho = jnp.where(
                chi2 <= delta2,
                chi2,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2,
            )
        else:
            wh = jnp.ones_like(chi2)
            rho = chi2
        sel = act * valid * ok
        wgt = wh * wsig * sel
        cost_vec = sel * rho + 1e7 * (act * valid * (1.0 - ok))

        # J rows (translation cols -dp_dP, rotation cols +dp_dP @ hat(P))
        a0, a2 = fx * iz, -fx * Px * iz2
        b1, b2 = fy * iz, -fy * Py * iz2
        ju = (-a0, jnp.zeros_like(a0), -a2,
              -a2 * Py, -a0 * Pz + a2 * Px, a0 * Py)
        jv = (jnp.zeros_like(b1), -b1, -b2,
              b1 * Pz - b2 * Py, b2 * Px, -b1 * Px)
        c2 = a2 + bf * iz2
        jur = (-a0 * stereo, jnp.zeros_like(a0), -c2 * stereo,
               -c2 * Py * stereo, (-a0 * Pz + c2 * Px) * stereo,
               a0 * Py * stereo)

        H = [[None] * 6 for _ in range(6)]
        bv = [None] * 6
        for i in range(6):
            bv[i] = wgt * (ju[i] * ru + jv[i] * rv + jur[i] * rur)
            for j in range(i, 6):
                H[i][j] = wgt * (ju[i] * ju[j] + jv[i] * jv[j] + jur[i] * jur[j])

        if has_lines:
            sPx, sPy, sPz, rs, oks, sizv = ln_endpoint(T, sX, sY, sZ)
            ePx, ePy, ePz, re_, oke, eizv = ln_endpoint(T, eX, eY, eZ)
            okl = oks * oke
            chi2l = (rs * rs + re_ * re_) * wl
            if robust:
                whl = jnp.where(
                    chi2l <= C.CHI2_LINE, 1.0,
                    jnp.sqrt(C.CHI2_LINE / jnp.maximum(chi2l, 1e-12)),
                )
                rhol = jnp.where(
                    chi2l <= C.CHI2_LINE, chi2l,
                    2.0 * jnp.sqrt(C.CHI2_LINE * jnp.maximum(chi2l, 0.0))
                    - C.CHI2_LINE,
                )
            else:
                whl = jnp.ones_like(chi2l)
                rhol = chi2l
            sell = actl * lvalid * okl
            wgtl = whl * wl * sell
            cost_vec_l = sell * rhol + 1e7 * (actl * lvalid * (1.0 - okl))

            # residual r = -res; J endpoint row = (-dres_dP | +rot_cols(dres_dP))
            # (solvers/pose.py _line_residual_jac: J = -[dres_dP | -rot_cols]).
            # Line vectors are [lsub, 128] while point vectors are
            # [sub, 128]: accumulate separately, merge after the reduce.
            Hl = [[None] * 6 for _ in range(6)]
            bl = [None] * 6
            for (Px_, Py_, Pz_, r_, izv) in (
                (sPx, sPy, sPz, rs, sizv), (ePx, ePy, ePz, re_, eizv)
            ):
                iz2_ = izv * izv
                d0 = la * fx * izv
                d1 = lb * fy * izv
                d2 = -(la * fx * Px_ + lb * fy * Py_) * iz2_
                jl = (-d0, -d1, -d2,
                      d1 * Pz_ - d2 * Py_, -d0 * Pz_ + d2 * Px_, d0 * Py_ - d1 * Px_)
                rr = -r_
                for i in range(6):
                    ti = wgtl * jl[i] * rr
                    bl[i] = ti if bl[i] is None else bl[i] + ti
                    for j in range(i, 6):
                        tij = wgtl * jl[i] * jl[j]
                        Hl[i][j] = tij if Hl[i][j] is None else Hl[i][j] + tij

        # reduce vectors -> scalars; b = -J^T W r (GN step: H delta = b).
        # A separate full reduce per quantity is ~1 us each on the VPU
        # (vector->SREG crossing); instead sublane-reduce each accumulator
        # to [1, 128], stack all 28 (+28 line) rows, do ONE cross-lane
        # reduction, and read the scalars back from VMEM scratch.
        rows = []
        for i in range(6):
            for j in range(i, 6):
                rows.append(jnp.sum(H[i][j], axis=0, keepdims=True))
        for i in range(6):
            rows.append(jnp.sum(bv[i], axis=0, keepdims=True))
        rows.append(jnp.sum(cost_vec, axis=0, keepdims=True))
        if has_lines:
            for i in range(6):
                for j in range(i, 6):
                    rows.append(jnp.sum(Hl[i][j], axis=0, keepdims=True))
            for i in range(6):
                rows.append(jnp.sum(bl[i], axis=0, keepdims=True))
            rows.append(jnp.sum(cost_vec_l, axis=0, keepdims=True))
        stacked = jnp.concatenate(rows, axis=0)  # [R, 128]
        red = jnp.sum(stacked, axis=1, keepdims=True)  # [R, 1]
        nr = len(rows)
        rscr[0:nr, 0:1] = red
        k = 0
        Hs = [[None] * 6 for _ in range(6)]
        bs = [None] * 6
        if has_lines:
            off = 28  # line block starts after the 21+6+1 point rows
        for i in range(6):
            for j in range(i, 6):
                s = rscr[k, 0]
                if has_lines:
                    s = s + rscr[off + k, 0]
                Hs[i][j] = s
                Hs[j][i] = s
                k += 1
        for i in range(6):
            s = rscr[21 + i, 0]
            if has_lines:
                s = s + rscr[off + 21 + i, 0]
            bs[i] = -s
        cost = rscr[27, 0] + (rscr[off + 27, 0] if has_lines else 0.0)
        return Hs, bs, cost

    # active masks start at valid
    act = jnp.ones_like(valid)
    actl = jnp.ones_like(lvalid) if has_lines else None

    for rnd in range(rounds):
        robust = rnd < rounds - 1
        n_iters = iters_schedule[rnd % len(iters_schedule)]
        H, b, cost = build(pose, act, actl, robust)
        lam = _TAU * jnp.maximum(
            jnp.maximum(jnp.maximum(jnp.abs(H[0][0]), jnp.abs(H[1][1])),
                        jnp.maximum(jnp.abs(H[2][2]), jnp.abs(H[3][3]))),
            jnp.maximum(jnp.abs(H[4][4]), jnp.abs(H[5][5])),
        )
        nu = jnp.float32(2.0)
        for _ in range(n_iters):
            d = _lu_solve6(H, b, lam)
            finite = jnp.bool_(True)
            for k in range(6):
                finite = finite & (d[k] == d[k]) & (jnp.abs(d[k]) < 1e30)
            T_new = se3_exp_compose(d, pose)
            Hn, bn, cn = build(T_new, act, actl, robust)
            accept = (cn < cost) & finite
            pose = tuple(jnp.where(accept, T_new[k], pose[k]) for k in range(12))
            for i in range(6):
                for j in range(6):
                    H[i][j] = jnp.where(accept, Hn[i][j], H[i][j])
                b[i] = jnp.where(accept, bn[i], b[i])
            cost = jnp.where(accept, cn, cost)
            lam = jnp.where(accept, lam / 3.0, lam * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
        # chi2 re-classification at the round's final pose
        chi2, ok = pt_chi2(pose)
        act = valid * ok * (chi2 <= delta2).astype(f32)
        # the jnp path classifies with chi2=inf where ~ok: ~ok -> inactive
        act = jnp.where(ok > 0, act, 0.0)
        if has_lines:
            chi2l, okl = ln_chi2(pose)
            actl = lvalid * okl * (chi2l <= C.CHI2_LINE).astype(f32)

    # outputs
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pv = jnp.zeros((1, 128), f32)
    for k in range(12):
        pv = pv + jnp.where(lane == k, pose[k], 0.0)
    pose_ref[:] = pv
    pin_ref[:] = act
    if has_lines:
        lin_ref[:] = actl
    else:
        lin_ref[:] = jnp.zeros((lsub, 128), f32)


@functools.partial(
    jax.jit,
    static_argnames=("rounds", "iters_schedule", "has_lines", "interpret"),
)
def _pose_pallas(Tcw0, xw, obs, w, st, val, sw, ew, l2d, wl, lval, K, bf,
                 rounds, iters_schedule, has_lines, interpret=False):
    f32 = jnp.float32
    N = xw.shape[0]
    sub = N // 128
    L = sw.shape[0]
    lsub = max(L // 128, 1)
    par = jnp.concatenate([
        jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                   jnp.asarray(bf, f32)]),
        Tcw0[:3, :3].reshape(-1),
        Tcw0[:3, 3],
    ]).astype(f32)

    def prep3(a, s):
        return a.astype(f32).T.reshape(3, s, 128)

    kernel = functools.partial(_kernel, rounds, tuple(iters_schedule),
                               has_lines, sub, lsub)
    pose_v, pin, lin = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 128), f32),
            jax.ShapeDtypeStruct((sub, 128), f32),
            jax.ShapeDtypeStruct((lsub, 128), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, 128), f32), pltpu.VMEM((64, 128), f32)],
        interpret=interpret,
    )(
        par,
        prep3(xw, sub),
        prep3(obs, sub),
        w.astype(f32).reshape(sub, 128),
        st.astype(f32).reshape(sub, 128),
        val.astype(f32).reshape(sub, 128),
        prep3(sw, lsub),
        prep3(ew, lsub),
        prep3(l2d, lsub),
        wl.astype(f32).reshape(lsub, 128),
        lval.astype(f32).reshape(lsub, 128),
    )
    R = pose_v[0, :9].reshape(3, 3)
    t = pose_v[0, 9:12]
    Tcw = jnp.eye(4, dtype=f32).at[:3, :3].set(R).at[:3, 3].set(t)
    return Tcw, pin.reshape(-1) > 0, lin.reshape(-1)[:L] > 0


def pose_optimization_pallas(Tcw0, pts, K, bf, lines=None,
                             rounds=C.POSE_OPT_ROUNDS,
                             iters_schedule=C.POSE_OPT_SCHEDULE,
                             interpret=False):
    """Drop-in for solvers/pose.pose_optimization on the TPU backend."""
    has_lines = lines is not None
    N = pts.xw.shape[0]
    if N % 128 != 0:
        raise ValueError(f"point capacity {N} must be a multiple of 128")
    if has_lines:
        L = lines.sw.shape[0]
        if L % 128 != 0:
            raise ValueError(f"line capacity {L} must be a multiple of 128")
        sw, ew, l2d = lines.sw, lines.ew, lines.line2d
        wl, lval = lines.inv_sigma2, lines.valid
    else:
        sw = jnp.zeros((128, 3), jnp.float32)
        ew = jnp.zeros((128, 3), jnp.float32)
        l2d = jnp.zeros((128, 3), jnp.float32)
        wl = jnp.zeros(128, jnp.float32)
        lval = jnp.zeros(128, bool)
    Tcw, pin, lin = _pose_pallas(
        Tcw0, pts.xw, pts.obs, pts.inv_sigma2, pts.is_stereo, pts.valid,
        sw, ew, l2d, wl, lval, K, jnp.float32(bf),
        rounds, tuple(iters_schedule), has_lines, interpret,
    )
    return Tcw, pin, (lin if has_lines else None)
