"""Hough circle detection (`detect-circles/detect_circles.py:13`,
cv2.HoughCircles HOUGH_GRADIENT dp=1.2 minDist=75).

Gradient-vote detector re-derived from cv2's HOUGH_GRADIENT as ONE jitted
device program (no host vote loop), in four stages:

* **Voting** replicates cv2's fixed-point ray walk: each Canny edge pixel
  with a nonzero Sobel gradient votes along ±gradient at one vote per
  integer image-space radius, positions computed as
  ``(round(x·idp·1024) + r·round(idp·cosθ·1024)) >> 10`` — the same
  10-bit quantized direction and floor division cv2 uses, so vote counts
  are directly comparable and `acc_threshold` means cv2's `param2`. The
  radius axis is a `lax.scan` (peak memory: one [aH, aW] plane).
* **Centers**: cv2's 4-neighbor local-maximum rule (strictly greater than
  left/top, ≥ right/bottom) over cells `> param2`, then top-K by
  accumulator value. Real photos yield thousands of such candidates (the
  soda demo: ~2.1k) — the default `n_candidates` covers all of them.
* **Radius support** (a `lax.scan` over candidates): edge points whose
  gradient LINE passes within 2·dp of the candidate center — i.e. the
  points that actually voted for it — are binned by Euclidean distance
  (cv2's bin width dp/10); the dp-wide window maximizing count/r gives
  (radius, support). The direction gate is the discriminator cv2's raw
  distance counting lacks: on the 8circles demo the central circle's
  unfiltered count/r optimum is a 900-point pileup at r≈149 (the far
  poles of the 8 surrounding rings), while the true 275-point ring at
  r≈48.5 wins once only voting-consistent points count. Circles need
  support > param2.
* **Selection**: candidates sorted by support (desc; ties radius desc,
  x, y asc — cv2's deterministic order), then a greedy EUCLIDEAN minDist
  dedup scan in that order.

Parity on the reference demo images (tests/test_library_oracles.py):
`8circles.png` and `simple.png` match cv2.HoughCircles' output EXACTLY in
count with centers within 0.01 px and radii within 0.6 px. On `soda.png`
(a busy photograph) cv2 reports 4 circles whose gradient-coherent support
is only 4–130 edge points at their own centers (measured) — three are
accumulation artifacts of raw distance counting and the fourth is a
perspective ellipse; the default detector intentionally rejects all four
at the demo threshold rather than reproduce cv2's noise floor.

`coherence_gate=False` (VERDICT r4 #4) reproduces cv2's RAW semantics
instead, reverse-engineered against cv2 5.0 to an exact match on all
three committed demo images (soda.png's 4 artifact circles included).
cv2's actual radius estimator — pinned by ~20 independent probes
(param2 binary searches at minDist=1 measure each center's internal
maxCount; minRadius sweeps expose window alignment; every cv2 output
radius is an exact multiple of dp/10) — differs from a sliding window:

* distance bins of width dp/10 are scanned TOP-DOWN; each nonempty bin
  anchors a NON-OVERLAPPING 10-bin window (and the bin below a finished
  window is skipped — an 11-bin stride);
* the window's radius is ``((upbin + jend) / 2) * dp/10`` with C INTEGER
  division, jend = max(upbin-10, -1) — so a window anchored at bin ≤ 9
  (an edge pixel within ~1 px of the center) gets a near-zero radius,
  and count/r lets a SINGLE such point outscore a 400-point ring: the
  top-vote soda center (accumulator 732) is rejected by cv2 purely
  because one edge point sits 0.63 px away (its winning window has
  count 1 ≤ param2). This quirk is load-bearing for parity.
* criterion count/r with ``cur*rBest >= maxCount*rCur`` (ties replace,
  descending processing) and a count-only bootstrap while rBest==0;
* maxCount is the RAW window count (no direction gate), the circle
  passes if maxCount > param2, and final ordering is support desc /
  radius desc / x / y with greedy Euclidean minDist dedup — the same
  selection the gated mode uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.edges import canny, sobel


@functools.partial(
    jax.jit,
    static_argnames=(
        "dp",
        "min_dist",
        "canny_high",
        "acc_threshold",
        "min_radius",
        "max_radius",
        "max_circles",
        "n_candidates",
        "direction_tol",
        "coherence_gate",
    ),
)
def hough_circles_device(
    gray: jnp.ndarray,
    *,
    dp: float = 1.2,
    min_dist: float = 75.0,
    canny_high: float = 100.0,
    acc_threshold: float = 100.0,
    min_radius: int = 0,
    max_radius: int = 0,
    max_circles: int = 16,
    n_candidates: int = 4096,
    direction_tol: float = 2.0,
    coherence_gate: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[H, W] uint8 → (circles [max_circles, 3] (x, y, r), valid mask).
    Fixed-size jittable core; circles are in descending radius-support
    order (accumulator-vote order when `coherence_gate=False` — cv2's raw
    semantics, see module docstring) and `valid` is monotone (all True
    rows precede all False rows). `max_radius<=0` → max(H, W),
    `min_radius<0` → 0 (cv2 defaults); `direction_tol` is the
    gradient-line gate in units of dp (see module docstring)."""
    h, w = gray.shape
    if max_radius <= 0:
        max_radius = max(h, w)
    min_radius = max(0, min_radius)
    idp = 1.0 / dp
    ah, aw = int(np.ceil(h * idp)), int(np.ceil(w * idp))

    # cv2.HoughCircles computes its Sobel with BORDER_REPLICATE (as does
    # the Canny it feeds); reflect-101 here changes border-pixel votes.
    edges = canny(gray, canny_high / 2.0, canny_high) > 0
    gx = sobel(gray, 1, 0, 3, border="replicate").astype(jnp.float32)
    gy = sobel(gray, 0, 1, 3, border="replicate").astype(jnp.float32)
    mag = jnp.hypot(gx, gy)
    votable = edges & ((gx != 0) | (gy != 0))
    safe = jnp.where(mag > 0, mag, 1.0)
    ux = gx / safe
    uy = gy / safe

    # cv2 fixed-point voting (SHIFT=10): quantize the step direction once
    # per pixel, walk in integer arithmetic, floor to accumulator cells.
    # The float op ORDER mirrors cv2's HoughCirclesAccumInvoker exactly —
    # ((v·idp)·1024)/mag, all f32 — because half-even rounding at .5
    # boundaries differs between op orders and 8circles.png's symmetric
    # gradients hit those boundaries constantly.
    ONE = 1024
    idp_f = jnp.float32(idp)
    one_f = jnp.float32(ONE)
    sx = jnp.round((gx * idp_f) * one_f / safe).astype(jnp.int32)
    sy = jnp.round((gy * idp_f) * one_f / safe).astype(jnp.int32)
    ys_f = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs_f = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x0 = jnp.round((xs_f * idp_f) * one_f).astype(jnp.int32)
    y0 = jnp.round((ys_f * idp_f) * one_f).astype(jnp.int32)

    radii = jnp.arange(min_radius, max_radius + 1, dtype=jnp.int32)

    def vote(acc, r):
        for sign in (1, -1):
            x2 = jnp.right_shift(x0 + sign * r * sx, 10)
            y2 = jnp.right_shift(y0 + sign * r * sy, 10)
            ok = votable & (x2 >= 0) & (x2 < aw) & (y2 >= 0) & (y2 < ah)
            acc = acc.at[
                jnp.clip(y2, 0, ah - 1), jnp.clip(x2, 0, aw - 1)
            ].add(ok.astype(jnp.int32))
        return acc, None

    acc, _ = jax.lax.scan(vote, jnp.zeros((ah, aw), jnp.int32), radii)

    # Centers: cv2's 4-neighbor local-max rule over cells > param2.
    pad = jnp.pad(acc, 1)
    c = pad[1:-1, 1:-1]
    local_max = (
        (c > int(acc_threshold))
        & (c > pad[1:-1, :-2])
        & (c >= pad[1:-1, 2:])
        & (c > pad[:-2, 1:-1])
        & (c >= pad[2:, 1:-1])
    )
    cand_vals = jnp.where(local_max, c, 0).ravel()
    top_vals, top_idx = jax.lax.top_k(cand_vals, min(n_candidates, ah * aw))
    cand_ay = (top_idx // aw).astype(jnp.float32)
    cand_ax = (top_idx % aw).astype(jnp.float32)
    cand_ok = top_vals > 0

    # Radius support per candidate: direction-gated distance histogram,
    # dp/10 bins (cv2's nBinsPerDr), dp-wide window maximizing count/r.
    f_dp = jnp.float32(dp)
    bin_size = dp / 10.0
    nbins = int(round((max_radius - min_radius) / bin_size)) + 1
    tol = jnp.float32(direction_tol * dp)

    def estimate(_, cand):
        ay, ax, ok = cand
        cx = (ax + 0.5) * f_dp
        cy = (ay + 0.5) * f_dp

        def heavy(_):
            ddx = cx - xs_f
            ddy = cy - ys_f
            # cv2 computes sqrt(dx*dx + dy*dy) in f32; match it exactly so
            # bin-boundary points land in the same bin (raw-mode parity).
            d = jnp.sqrt(ddx * ddx + ddy * ddy)
            sel = votable & (d >= min_radius) & (d <= max_radius)
            if coherence_gate:
                cross = jnp.abs(ddx * uy - ddy * ux)
                sel = sel & (cross <= tol)
            bins_idx = jnp.clip(
                jnp.round((d - min_radius) / bin_size).astype(jnp.int32),
                0,
                nbins - 1,
            )
            hist = jnp.zeros((nbins,), jnp.int32).at[bins_idx].add(
                sel.astype(jnp.int32)
            )
            if coherence_gate:
                cs = jnp.concatenate(
                    [jnp.zeros((10,), jnp.int32), jnp.cumsum(hist)]
                )
                win = cs[10:] - cs[:-10]  # count in bins [j-9..j], index j
                j = jnp.arange(nbins, dtype=jnp.float32)
                r_cur = (2.0 * j - 9.0) / 20.0 * f_dp + min_radius
                # score = count / radius, denominator floored at 1 px:
                # sub-pixel windows (r_cur ≤ 0 included) would otherwise
                # score ~count/1e-6 and a single stray edge pixel near the
                # center would hijack the argmax from a genuine ring.
                score = jnp.where(
                    (win > 0) & (r_cur > 0),
                    win.astype(jnp.float32) / jnp.maximum(r_cur, 1.0),
                    -1.0,
                )
                b = jnp.argmax(score)
                return r_cur[b], win[b]

            # cv2's exact estimator (module docstring): a state machine
            # over bins DESCENDING — nonempty bins anchor non-overlapping
            # 10-bin windows (11-bin stride), C-integer-divide window
            # radius, count/r criterion with >= ties, NO radius floor.
            # phase: 0 idle, 1 consuming a window, 2 skip-one-bin.
            def bin_step(st, jb):
                phase, upbin, cur, left, r_bst, m_cnt = st
                bj, b = jb
                idle = phase == 0
                cons = phase == 1
                start = idle & (b > 0) & (bj > 0)
                cur2 = jnp.where(cons, cur + b, jnp.where(start, b, cur))
                left2 = jnp.where(
                    cons, left - 1,
                    jnp.where(start, jnp.minimum(9, bj), left),
                )
                upbin2 = jnp.where(start, bj, upbin)
                fin = cons & (left2 == 0)
                jend = jnp.maximum(upbin2 - 10, -1)
                r_cur = ((upbin2 + jend) // 2).astype(
                    jnp.float32
                ) * jnp.float32(bin_size) + jnp.float32(min_radius)
                take = fin & (
                    (cur2.astype(jnp.float32) * r_bst
                     >= m_cnt.astype(jnp.float32) * r_cur)
                    | ((r_bst < 1e-7) & (cur2 >= m_cnt))
                )
                phase2 = jnp.where(
                    start, 1, jnp.where(fin, 2, jnp.where(cons, 1, 0))
                )
                return (
                    phase2,
                    upbin2,
                    cur2,
                    left2,
                    jnp.where(take, r_cur, r_bst),
                    jnp.where(take, cur2, m_cnt),
                ), None

            init = (
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.float32(0.0), jnp.int32(0),
            )
            js = jnp.arange(nbins - 1, -1, -1, dtype=jnp.int32)
            (_, _, _, _, r_bst, m_cnt), _ = jax.lax.scan(
                bin_step, init, (js, hist[::-1])
            )
            return r_bst, m_cnt

        # ok=False padding slots (top-k beyond the real local maxima) skip
        # the O(H·W) distance/histogram pass entirely.
        r_best, support = jax.lax.cond(
            ok, heavy, lambda _: (jnp.float32(0.0), jnp.int32(0)), None
        )
        return None, (cx, cy, r_best, support)

    _, (cxs, cys, rs, supports) = jax.lax.scan(
        estimate, None, (cand_ay, cand_ax, cand_ok)
    )
    passed = supports > int(acc_threshold)
    supports = jnp.where(passed, supports, 0)

    # cv2's deterministic order (both modes): support desc, radius desc,
    # x asc, y asc — cv2 sorts EstimatedCircles by their support count
    # (verified on soda.png: the output sequence follows measured
    # maxCounts 360/175/133/102, not accumulator values 490/109/102/108).
    _, _, _, _, cxs, cys, rs, passed = jax.lax.sort(
        (-supports, -rs, cxs, cys, cxs, cys, rs, passed), num_keys=4
    )

    # Greedy Euclidean minDist dedup in that order.
    min_dist2 = jnp.float32(min_dist * min_dist)

    def dedup(state, cand):
        xs_a, ys_a, rs_a, n_acc = state
        cx, cy, r, ok = cand
        slot = jnp.arange(max_circles)
        live = slot < n_acc
        d2 = (xs_a - cx) ** 2 + (ys_a - cy) ** 2
        take = ok & ~jnp.any(live & (d2 < min_dist2)) & (n_acc < max_circles)
        at = jnp.where(take, n_acc, max_circles - 1)
        upd = lambda a, v: jnp.where(  # noqa: E731
            take & (slot == at), v, a
        )
        return (
            upd(xs_a, cx),
            upd(ys_a, cy),
            upd(rs_a, r),
            n_acc + take.astype(jnp.int32),
        ), None

    init = (
        jnp.full((max_circles,), -1e9, jnp.float32),
        jnp.full((max_circles,), -1e9, jnp.float32),
        jnp.zeros((max_circles,), jnp.float32),
        jnp.int32(0),
    )
    (xs_a, ys_a, rs_a, n_acc), _ = jax.lax.scan(
        dedup, init, (cxs, cys, rs, passed)
    )
    circles = jnp.stack([xs_a, ys_a, rs_a], axis=-1)
    valid = jnp.arange(max_circles) < n_acc
    return circles, valid


def hough_circles(
    gray,
    dp: float = 1.2,
    min_dist: float = 75.0,
    canny_high: float = 100.0,
    acc_threshold: float = 100.0,
    min_radius: int = 0,
    max_radius: int = 0,
    max_circles: int = 16,
    coherence_gate: bool = True,
) -> np.ndarray:
    """[H, W] uint8 → [K, 3] (x, y, r) circles (K ≤ max_circles), support
    order. Host wrapper over the jitted device core; defaults mirror
    `cv2.HoughCircles(gray, HOUGH_GRADIENT, 1.2, 75)` — the reference demo
    call (`detect_circles.py:13`): param1=100 → canny_high, param2=100 →
    acc_threshold, unbounded radius. `coherence_gate=False` reproduces
    cv2's raw distance-count semantics on busy photographs (module
    docstring)."""
    circles, valid = hough_circles_device(
        jnp.asarray(gray),
        dp=dp,
        min_dist=min_dist,
        canny_high=canny_high,
        acc_threshold=acc_threshold,
        min_radius=min_radius,
        max_radius=max_radius,
        max_circles=max_circles,
        coherence_gate=coherence_gate,
    )
    circles = np.asarray(circles)
    valid = np.asarray(valid)
    return circles[valid]
