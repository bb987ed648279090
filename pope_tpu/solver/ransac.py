"""Batched essential-matrix RANSAC + pose recovery, static shapes, on-chip.

Reference behavior: src/utils/metrics.py:69-94 —
  1. normalize keypoints by intrinsics, normalize the pixel threshold by the
     mean focal length (:72-77),
  2. robustly fit an essential matrix (cv2.findEssentialMat, 5-pt RANSAC),
  3. recover (R, t) by testing the 4 decompositions for cheirality
     (cv2.recoverPose), returning the one with most points in front.

TPU-native redesign: instead of OpenCV's sequential hypothesise-and-verify
loop, hypotheses are drawn and scored in parallel batches — an (H, 8)-gather,
a batched nullspace solve (eigh of 9x9 normal matrices), and an (H, N)
Sampson-distance scoring matmul — over several guided resampling rounds
(later rounds bias sampling toward the incumbent consensus, half of each
round stays uniform). Every round's best model is locally optimized with
annealed hard-band IRLS refits, the winner is selected by banded consensus,
and (R, t) is polished by Gauss-Newton on the essential manifold with
noise-scale robust weights. The 8-point solver replaces Nister's 5-point:
its nullspace solve is branch-free and batchable, and the guided rounds +
polish recover (and on noisy data exceed) 5-point-RANSAC accuracy — verified
head-to-head against cv2.findEssentialMat/recoverPose in tests/test_solver.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pope_tpu.geometry.epipolar import normalize_keypoints, sampson_distance, triangulate_midpoint
from pope_tpu.ops.linalg import smallest_eigvec, svd3


def _use_jacobi() -> bool:
    # fixed-sweep Jacobi wins on TPU (jnp.linalg lowers to slow while-loop
    # routines there) but its unrolled rotations are slower than LAPACK on
    # CPU — pick per backend at trace time
    return jax.default_backend() == "tpu"


def _nullvec9(AtA):
    if _use_jacobi():
        return smallest_eigvec(AtA)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[:, 0]


def _svd3x3(E):
    if _use_jacobi():
        return svd3(E)
    return jnp.linalg.svd(E)
from pope_tpu.utils.precision import f32_matmul


class RansacResult(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,) unit translation
    inliers: jnp.ndarray  # (N,) bool (RANSAC inliers, valid slots only)
    n_inliers: jnp.ndarray  # () int32
    n_cheirality: jnp.ndarray  # () int32 points passing the in-front test
    E: jnp.ndarray  # (3, 3)
    ok: jnp.ndarray  # () bool — enough points and a usable model found


def _hartley(pts, w):
    """Weighted Hartley conditioning: centroid to origin, RMS radius sqrt(2).
    Returns (normalized pts, 3x3 transform T with p' = T p_homo)."""
    n = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    centered = pts - mean
    rms = jnp.sqrt(jnp.sum(jnp.sum(centered**2, -1) * w) / n)
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-9)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return centered * s, T


def _masked_quantile(x, maskf, q):
    """Quantile of x over entries where maskf > 0 (invalid -> +inf tail)."""
    n = jnp.maximum(jnp.sum(maskf), 1.0)
    xs = jnp.sort(jnp.where(maskf > 0, x, jnp.inf))
    idx = jnp.clip((q * (n - 1.0)).astype(jnp.int32), 0, x.shape[0] - 1)
    return xs[idx]


def _eight_point(p0, p1, w=None, project: bool = True):
    """Least-squares essential matrix from >=8 correspondences.

    p0, p1: (K, 2) normalized (camera) coords; w: optional (K,) weights.
    Hartley-conditions both point sets, solves min ||A e|| via the smallest
    eigenvector of A^T A, optionally projects onto the essential manifold
    (singular values -> (1, 1, 0)), and undoes the conditioning
    (E = T1^T E' T0). Scoring-stage hypotheses skip the projection — the
    Sampson distance ranks unprojected fundamental-style fits just as well,
    and it halves the batched-SVD count on the hot path; refit outputs are
    always projected.
    """
    if w is None:
        w = jnp.ones(p0.shape[0], p0.dtype)
    q0, T0 = _hartley(p0, w)
    q1, T1 = _hartley(p1, w)
    x0, y0 = q0[:, 0], q0[:, 1]
    x1, y1 = q1[:, 0], q1[:, 1]
    ones = jnp.ones_like(x0)
    # x1^T E x0 = 0 with e row-major
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1)
    A = A * w[:, None]
    AtA = A.T @ A  # (9, 9)
    e = _nullvec9(AtA)
    E = T1.T @ e.reshape(3, 3) @ T0
    if not project:
        return E
    # project to essential manifold
    U, S, Vt = _svd3x3(E)
    S_proj = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return U @ jnp.diag(S_proj) @ Vt


def _sampson_residual(E, p0, p1):
    """Signed first-order epipolar residual (sqrt of Sampson distance)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    h0 = jnp.stack([x0, y0, jnp.ones_like(x0)], -1)
    h1 = jnp.stack([x1, y1, jnp.ones_like(x1)], -1)
    Ep0 = h0 @ E.T
    Etp1 = h1 @ E
    num = jnp.sum(h1 * Ep0, -1)
    den = jnp.sqrt(
        jnp.maximum(Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2, 1e-18)
    )
    return num / den


def _exp_so3(w):
    """Rodrigues: (3,) -> (3, 3). Written with the unnormalized-skew series
    R = I + A.W + B.W^2 so it is differentiable at w = 0 (a bare
    norm+normalize has NaN jacobians at the origin, which silently kills
    Gauss-Newton steps seeded at zero)."""
    th2 = jnp.sum(w * w)
    small = th2 < 1e-8
    # where-safe: evaluate the exact branch at a benign value so its (unused)
    # gradient stays finite, and use Taylor series near zero
    th2s = jnp.where(small, 1.0, th2)
    ths = jnp.sqrt(th2s)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(ths) / ths)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(ths)) / th2s)
    W = jnp.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]], w.dtype
    )
    return jnp.eye(3, dtype=w.dtype) + A * W + B * (W @ W)


def refine_pose_gn(R, t, p0, p1, weights, iters: int = 5, damping: float = 1e-6):
    """Levenberg-Marquardt refinement of (R, t) minimizing weighted Sampson
    error.

    Parameterizes the update as R <- exp([w]x) R and t on its 2-D tangent
    plane (5 DoF, the correct dimensionality of an essential matrix), with
    adaptive damping: a rejected step raises lambda so the next iteration
    tries a shorter, more gradient-like step instead of recomputing the same
    rejected one. This is the polish OpenCV's pipeline lacks; on
    LoFTR-quality matches it cuts the rotation error well below the
    minimal-solver noise floor.
    """

    def E_of(params, R0, t0):
        w, phi = params[:3], params[3:]
        Rn = _exp_so3(w) @ R0
        # tangent basis of the unit-sphere at t0
        a = jnp.where(jnp.abs(t0[0]) < 0.9, jnp.array([1.0, 0.0, 0.0], t0.dtype), jnp.array([0.0, 1.0, 0.0], t0.dtype))
        b1 = jnp.cross(t0, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        b2 = jnp.cross(t0, b1)
        tn = t0 + phi[0] * b1 + phi[1] * b2
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        from pope_tpu.geometry.pose import skew

        return skew(tn) @ Rn, Rn, tn

    sw = jnp.sqrt(jnp.maximum(weights, 0.0))

    def step(carry, _):
        R0, t0, lam = carry
        zero = jnp.zeros(5, R0.dtype)

        def resid(params):
            E, _, _ = E_of(params, R0, t0)
            return _sampson_residual(E, p0, p1) * sw

        r = resid(zero)
        J = jax.jacfwd(resid)(zero)  # (N, 5)
        JtJ = J.T @ J
        # scale-aware LM damping (Marquardt: lambda * diag)
        D = jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-12))
        delta = -jnp.linalg.solve(JtJ + lam * D + damping * jnp.eye(5, dtype=R0.dtype), J.T @ r)
        _, Rn, tn = E_of(delta, R0, t0)
        better = jnp.sum(resid(delta) ** 2) < jnp.sum(r**2)
        Rn = jnp.where(better, Rn, R0)
        tn = jnp.where(better, tn, t0)
        lam = jnp.where(better, jnp.maximum(lam / 3.0, 1e-9), jnp.minimum(lam * 10.0, 1e6))
        return (Rn, tn, lam), None

    lam0 = jnp.asarray(1e-3, R.dtype)
    (R_f, t_f, _), _ = jax.lax.scan(step, (R, t, lam0), None, length=iters)
    return R_f, t_f


def _few_point_pose(p0, p1, vmaskf):
    """Pose from 5-7 correspondences (below the 8-point minimal sample).

    The reference still solves these pairs (cv2's 5-point needs only 5,
    src/utils/metrics.py:70); a TPU-native Nister would need a 10x10
    polynomial eigen-solve, so instead we run multi-start Gauss-Newton
    directly on the 5-DoF essential manifold: seeds from the (rank-deficient,
    but projected) least-squares fit's 4 decompositions plus 6 canonical
    translation directions, polished against the weighted Sampson error of
    ALL valid points, winner by cost, then cheirality via the standard
    4-decomposition test. With >=5 clean matches (the extraction path skips
    pairs below 5, linemod.py:142-145) the GN basin is wide enough in
    practice — tested in test_solver.py (6-match recovery).
    """
    E_ls = _eight_point(p0, p1, w=vmaskf)
    U, _, Vt = _svd3x3(E_ls)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E_ls.dtype)
    R1, R2 = U @ W @ Vt, U @ W.T @ Vt
    t0 = U[:, 2] / jnp.maximum(jnp.linalg.norm(U[:, 2]), 1e-12)
    eye = jnp.eye(3, dtype=E_ls.dtype)
    ex, ey, ez = eye[0], eye[1], eye[2]
    seeds_R = jnp.stack([R1, R1, R2, R2, eye, eye, eye, eye, eye, eye])
    seeds_t = jnp.stack([t0, -t0, t0, -t0, ex, -ex, ey, -ey, ez, -ez])

    from pope_tpu.geometry.pose import skew

    def polish(R0, tt0):
        R, t = refine_pose_gn(R0, tt0, p0, p1, vmaskf, iters=16)
        E = skew(t) @ R
        cost = jnp.sum(_sampson_residual(E, p0, p1) ** 2 * vmaskf)
        return R, t, cost

    Rs, ts, costs = jax.vmap(polish)(seeds_R, seeds_t)
    # With exactly 5 points the problem has up to 10 algebraic solutions, all
    # at ~zero Sampson cost — cost alone cannot split them (cv2's 5-point
    # enumerates and lets recoverPose's cheirality decide). Do the same:
    # among near-optimal candidates, pick the one with the most points in
    # front of both cameras; cost only tie-breaks.
    Es = jax.vmap(lambda R_, t_: skew(t_) @ R_)(Rs, ts)
    R4, t4, ngood4 = jax.vmap(lambda E_: recover_pose_from_E(E_, p0, p1, vmaskf))(Es)
    # Cheirality first (the algebraic cost cannot split interpolating
    # solutions at n=5), cost as the tie-break among equal-cheirality
    # candidates. The n=5 ambiguity is intrinsic — cv2's true 5-point errs
    # comparably on such instances (see test_solver.py head-to-head).
    # strictly < 1 so it can never cancel a whole cheirality vote
    cost_rank = 0.5 * costs / (jnp.max(costs) + 1e-18)
    score = ngood4.astype(jnp.float32) - cost_rank
    b = jnp.argmax(score)
    return R4[b], t4[b], Es[b], ngood4[b]


def recover_pose_from_E(E, p0, p1, weight):
    """Cheirality test over the 4 (R, t) decompositions of E.

    p0, p1: (N, 2) normalized coords; weight: (N,) float votes (use the
    RANSAC inlier mask). Returns (R, t, n_good) of the winning decomposition
    (cv2.recoverPose semantics, metrics.py:87-93).
    """
    U, _, Vt = _svd3x3(E)
    # keep rotations proper
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    def count_front(R, tt):
        z0, z1 = triangulate_midpoint(p0, p1, R, tt)
        return jnp.sum(((z0 > 0) & (z1 > 0)).astype(jnp.float32) * weight)

    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])
    counts = jax.vmap(count_front)(cands_R, cands_t)
    best = jnp.argmax(counts)
    return cands_R[best], cands_t[best], counts[best].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("n_hyps", "sample_size", "refit_iters", "n_rounds")
)
@f32_matmul
def estimate_pose_ransac(
    kpts0,
    kpts1,
    K0,
    K1,
    valid,
    key,
    thresh_px: float = 0.5,
    n_hyps: int = 2048,
    sample_size: int = 8,
    refit_iters: int = 1,
    n_rounds: int = 3,
) -> RansacResult:
    """Parallel-hypothesis essential-matrix RANSAC.

    Args:
      kpts0, kpts1: (N, 2) pixel coords (padded slots arbitrary).
      K0, K1: (3, 3) intrinsics.
      valid: (N,) bool mask of real correspondences.
      key: jax PRNG key (deterministic per pair).
      thresh_px: pixel inlier threshold, normalized by mean focal
        like the reference (metrics.py:76-77).
      n_hyps: hypotheses scored in parallel (the fixed-budget analogue of
        cv2's confidence-driven iteration count).
      n_rounds: guided-resampling rounds. Measured on the synthetic
        cv2-benchmark data (250 pts, 1px noise, 30% outliers, 12 trials):
        3 rounds R med 0.81deg / 6 rounds 0.71deg with mixed worst-cases —
        statistically indistinguishable — while solve time halves (97 ->
        ~50 ms per 4-pair batch on a v5e), so 3 is the default.
    Returns:
      RansacResult; `ok` is False when fewer than `sample_size` valid matches.
    """
    N = kpts0.shape[0]
    p0 = normalize_keypoints(kpts0[None], K0[None])[0]
    p1 = normalize_keypoints(kpts1[None], K1[None])[0]
    fmean = (K0[0, 0] + K1[1, 1] + K0[0, 0] + K1[1, 1]) / 4.0
    thr = thresh_px / fmean
    thr2 = thr * thr

    n_valid = jnp.sum(valid)
    vmaskf = valid.astype(jnp.float32)
    LOOSE = 16.0  # loose scoring band, in units of thr2

    def band_score_of(d, band_mult):
        """MSAC-style score over a band: a roughly-correct model captures
        nearly all true matches at a loose multiple of the threshold even
        when noise pushes them outside the strict band, so banded scores
        separate nearly-right models from outlier-overfit ones far better
        than strict counts. A wide band finds coarse consensus; a narrow
        band ranks refined candidates."""
        return jnp.sum(jnp.maximum(0.0, 1.0 - d / (band_mult * thr2)) * vmaskf[None, :], axis=1)

    def sample_round(k, log_w):
        """Draw n_hyps minimal samples (Gumbel-top-k weighted, distinct
        indices), fit E per sample, return the round's best model. Half of
        each round samples uniformly so a wrong incumbent cannot entrench
        itself through its own guidance weights."""
        g = jax.random.gumbel(k, (n_hyps, N))
        half = n_hyps // 2
        lw = jnp.concatenate(
            [jnp.zeros((half, N)), jnp.broadcast_to(log_w, (n_hyps - half, N))], axis=0
        )
        scores = jnp.where(valid[None, :], lw + g, -jnp.inf)
        _, samples = jax.lax.top_k(scores, sample_size)  # (H, k)
        E_h = jax.vmap(lambda a, b: _eight_point(a, b, project=False))(
            p0[samples], p1[samples]
        )  # (H, 3, 3)
        d = sampson_distance(p0[None], p1[None], E_h)  # (H, N)
        ls = band_score_of(d, LOOSE) + band_score_of(d, 4.0)
        b = jnp.argmax(ls)
        return E_h[b], ls[b]

    # --- guided multi-round search. Round 0 samples uniformly; subsequent
    # rounds bias sampling toward the incumbent's low-residual matches
    # (PROSAC-flavoured guided resampling). This is the stochastic mode
    # escape: with narrow-FOV / high-noise data the robust cost is
    # multi-modal and no amount of local refitting can leave a wrong mode,
    # but resampling from the consensus neighbourhood can.

    def round_step(carry, k):
        log_w, E_best, best_ls = carry
        E_r, ls_r = sample_round(k, log_w)
        better = ls_r > best_ls
        E_best = jnp.where(better, E_r, E_best)
        best_ls = jnp.maximum(ls_r, best_ls)
        d_best = sampson_distance(p0[None], p1[None], E_best[None])[0]
        scale = jnp.maximum(4.0 * thr2, _masked_quantile(d_best, vmaskf, 0.5))
        log_w = -jnp.log1p(d_best / scale)  # log of w = 1/(1 + d/scale)
        return (log_w, E_best, best_ls), E_r

    init = (jnp.zeros(N), jnp.eye(3), jnp.asarray(-1.0))
    (_, E_incumbent, _), E_rounds = jax.lax.scan(
        round_step, init, jax.random.split(key, n_rounds)
    )
    # candidate pool: every round's best + the final incumbent
    E_cands = jnp.concatenate([E_rounds, E_incumbent[None]], axis=0)

    # --- local optimization per candidate: adaptive hard-band IRLS refits,
    # band annealing from the loose band down to the strict threshold.
    # Guarded: keep the previous model if the strict inlier count shrinks.
    anneal = jnp.array([LOOSE, 4.0, 1.0, 1.0], jnp.float32)[: refit_iters + 3]

    def lo_chain(E0):
        d_0 = sampson_distance(p0[None], p1[None], E0[None])[0]
        inl0 = (d_0 < thr2) & valid

        def refit(carry, mult):
            E_cur, inl_cur = carry
            d_cur = sampson_distance(p0[None], p1[None], E_cur[None])[0]
            band = (d_cur < thr2 * mult) & valid
            w_soft = band.astype(jnp.float32) / (1.0 + d_cur / (thr2 * mult))
            E_new = _eight_point(p0, p1, w=w_soft)
            d_new = sampson_distance(p0[None], p1[None], E_new[None])[0]
            inl_new = (d_new < thr2) & valid
            better = jnp.sum(inl_new) >= jnp.sum(inl_cur)
            E_out = jnp.where(better, E_new, E_cur)
            inl_out = jnp.where(better, inl_new, inl_cur)
            return (E_out, inl_out), None

        (E_f, inl_f), _ = jax.lax.scan(refit, (E0, inl0), anneal)
        return E_f, inl_f

    E_pol, inl_pol = jax.vmap(lo_chain)(E_cands)
    d_pol_all = sampson_distance(p0[None], p1[None], E_pol)  # (C, N)
    final_score = jnp.sum(
        jnp.maximum(0.0, 1.0 - d_pol_all / (4.0 * thr2)) * vmaskf[None, :], axis=1
    ) + jnp.sum(inl_pol, axis=1)
    best_c = jnp.argmax(final_score)
    E_best = E_pol[best_c]
    inl_best = inl_pol[best_c]

    R, t, n_good = recover_pose_from_E(E_best, p0, p1, inl_best.astype(jnp.float32))

    # --- Gauss-Newton polish of (R, t). Weights live at the scale of the
    # actual residual noise (median over the loose consensus band), not the
    # user threshold: when match noise exceeds the threshold, the strict
    # inlier set is a tiny noise-dominated subsample and polishing against
    # it underuses the data.
    d_fin = sampson_distance(p0[None], p1[None], E_best[None])[0]
    band_f = (d_fin < LOOSE * thr2) & valid
    noise_scale = jnp.maximum(thr2, _masked_quantile(d_fin, band_f.astype(jnp.float32), 0.5))
    w_fin = band_f.astype(jnp.float32) / (1.0 + d_fin / noise_scale)
    R, t = refine_pose_gn(R, t, p0, p1, w_fin)
    from pope_tpu.geometry.pose import skew as _skew

    E_best = _skew(t) @ R

    # --- 5-7 valid matches: below the 8-point minimal sample, switch to the
    # multi-start manifold solver (the reference's 5-point path still scores
    # these pairs, metrics.py:70; without this they'd eat the 90-deg penalty)
    few = n_valid < sample_size
    R_f, t_f, E_f, n_good_f = _few_point_pose(p0, p1, vmaskf)
    R = jnp.where(few, R_f, R)
    t = jnp.where(few, t_f, t)
    E_best = jnp.where(few, E_f, E_best)
    n_good = jnp.where(few, n_good_f, n_good)

    d_pol = sampson_distance(p0[None], p1[None], E_best[None])[0]
    inl_best = (d_pol < thr2) & valid
    n_inl = jnp.sum(inl_best).astype(jnp.int32)
    ok = jnp.where(few, n_valid >= 5, n_inl >= sample_size)
    ok &= jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    return RansacResult(
        R=R, t=t, inliers=inl_best, n_inliers=n_inl, n_cheirality=n_good, E=E_best, ok=ok
    )
