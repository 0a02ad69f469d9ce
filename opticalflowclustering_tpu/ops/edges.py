"""Gradient / edge primitives: Sobel, Scharr, Laplacian, Canny, bilateral.

Reference call sites: barcode gradients (`detect-barcodes/detect_barcode.py:
12-13`, Scharr via ksize=-1), document edges (`DocumentScanner/scan.py:20`
Canny 75/200), Game Boy screen finding (`Pokedex/find_screen.py:18-19`
bilateralFilter(11,17,17) + Canny 30/200).

Sobel/Scharr are separable shifted-slice correlations (REFLECT_101 border,
like OpenCV). Canny is the full pipeline — Sobel gradients, 4-direction
non-maximum suppression, double threshold, and hysteresis as an iterative
8-neighbor dilation over the strong-edge mask (a bounded `lax.while_loop`
fixpoint — the TPU-friendly formulation of OpenCV's BFS stack).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.filters import sep_filter_axis


def _deriv_kernels(order: int, ksize: int) -> np.ndarray:
    """cv2.getDerivKernels column for one axis (smoothing if order=0)."""
    if ksize == -1:  # Scharr
        return np.array([3.0, 10.0, 3.0]) if order == 0 else np.array([-1.0, 0.0, 1.0])
    if ksize == 1:
        return np.array([1.0]) if order == 0 else np.array([-1.0, 0.0, 1.0])
    # Pascal's-triangle construction (OpenCV getDerivKernels).
    k = np.array([1.0])
    for _ in range(ksize - 1 - order):
        k = np.convolve(k, [1.0, 1.0])
    for _ in range(order):
        k = np.convolve(k, [1.0, -1.0])
    return k[::-1]


def sobel(
    img: jnp.ndarray, dx: int, dy: int, ksize: int = 3
) -> jnp.ndarray:
    """cv2.Sobel(img, CV_32F, dx, dy, ksize) / cv2.Scharr when ksize=-1.
    [..., H, W] → float32."""
    kx = _deriv_kernels(dx, ksize)
    ky = _deriv_kernels(dy, ksize)
    x = img.astype(jnp.float32)
    x = sep_filter_axis(x, ky, axis=-2, border="reflect101")
    x = sep_filter_axis(x, kx, axis=-1, border="reflect101")
    return x


def laplacian(img: jnp.ndarray, ksize: int = 1) -> jnp.ndarray:
    """cv2.Laplacian(img, CV_32F): sum of second derivatives."""
    if ksize == 1:
        k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
        x = img.astype(jnp.float32)
        h, w = x.shape[-2], x.shape[-1]
        pads = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
        xp = jnp.pad(x, pads, mode="reflect")
        acc = jnp.zeros_like(x)
        for i in range(3):
            for j in range(3):
                if k[i, j]:
                    acc = acc + jnp.float32(k[i, j]) * xp[..., i : i + h, j : j + w]
        return acc
    return sobel(img, 2, 0, ksize) + sobel(img, 0, 2, ksize)


def canny(
    img: jnp.ndarray,
    threshold1: float,
    threshold2: float,
    l2gradient: bool = False,
    hysteresis_iters: int = 64,
) -> jnp.ndarray:
    """cv2.Canny for a uint8 [..., H, W] image → uint8 edge map {0, 255}.

    Functional parity with OpenCV (aperture 3): Sobel gradients, L1 (default)
    or L2 magnitude, OpenCV's tan(22.5°)-sector NMS, double threshold, and
    hysteresis to fixpoint via bounded iterative strong-edge propagation.
    """
    f32 = jnp.float32
    low, high = f32(min(threshold1, threshold2)), f32(max(threshold1, threshold2))
    gx = sobel(img, 1, 0, 3)
    gy = sobel(img, 0, 1, 3)
    if l2gradient:
        mag = jnp.sqrt(gx * gx + gy * gy)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)

    h, w = mag.shape[-2], mag.shape[-1]
    pads = [(0, 0)] * (mag.ndim - 2) + [(1, 1), (1, 1)]
    mp = jnp.pad(mag, pads, mode="constant")

    def nb(dy, dx):
        return mp[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    # Sector selection à la OpenCV: compare |gy|·2^15 against tan22.5/tan67.5
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tg22 = f32(0.4142135623730950488016887242097)
    tg67 = f32(2.4142135623730950488016887242097)
    horiz = ay < ax * tg22  # gradient mostly horizontal → compare l/r
    vert = ay > ax * tg67  # mostly vertical → compare up/down
    diag1 = (jnp.sign(gx) == jnp.sign(gy)) & ~horiz & ~vert
    keep = jnp.where(
        horiz,
        (mag > nb(0, -1)) & (mag >= nb(0, 1)),
        jnp.where(
            vert,
            (mag > nb(-1, 0)) & (mag >= nb(1, 0)),
            jnp.where(
                diag1,
                (mag > nb(-1, -1)) & (mag >= nb(1, 1)),
                (mag > nb(-1, 1)) & (mag >= nb(1, -1)),
            ),
        ),
    )
    strong = keep & (mag > high)
    weak = keep & (mag > low)

    def dilate8(m):
        mpad = jnp.pad(m, pads, mode="constant")
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out | mpad[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        return out

    def body(state):
        cur, _ = state
        grown = dilate8(cur) & weak
        return grown, jnp.any(grown != cur)

    def cond(state):
        return state[1]

    final, _ = jax.lax.while_loop(
        cond, body, (strong, jnp.asarray(True))
    )
    return jnp.where(final, jnp.uint8(255), jnp.uint8(0))


def bilateral_filter(
    img: jnp.ndarray, d: int, sigma_color: float, sigma_space: float
) -> jnp.ndarray:
    """cv2.bilateralFilter for uint8/float [..., H, W] (grayscale) or
    [..., H, W, C]: windowed Gaussian in space × Gaussian in intensity,
    replicate border. OpenCV uses radius d//2 and exp tables; same math."""
    chan = img.ndim >= 3 and img.shape[-1] in (1, 3)
    x = img.astype(jnp.float32)
    if not chan:
        x = x[..., None]
    r = d // 2
    gauss_color = -0.5 / (sigma_color * sigma_color)
    h, w = x.shape[-3], x.shape[-2]
    pads = [(0, 0)] * (x.ndim - 3) + [(r, r), (r, r), (0, 0)]
    xp = jnp.pad(x, pads, mode="reflect")  # BORDER_DEFAULT = REFLECT_101
    num = jnp.zeros_like(x)
    den = jnp.zeros(x.shape[:-1] + (1,), jnp.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy * dy + dx * dx > r * r:
                continue
            sw = np.exp((dy * dy + dx * dx) * -0.5 / (sigma_space * sigma_space))
            nbr = xp[..., r + dy : r + dy + h, r + dx : r + dx + w, :]
            diff = jnp.sum(jnp.abs(nbr - x), axis=-1, keepdims=True)
            cw = jnp.exp(diff * diff * jnp.float32(gauss_color))
            wgt = jnp.float32(sw) * cw
            num = num + wgt * nbr
            den = den + wgt
    out = num / den
    if not chan:
        out = out[..., 0]
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out
