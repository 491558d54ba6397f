"""Synthetic lane-track dataset generator.

The reference's dataset (blue-cloth track with white lane lines captured by
the competition robot, README.md dataset sections) is not shipped, and 8 of
11 model blobs are stripped (.MISSING_LARGE_BLOBS). The rebuild is
self-sufficient: this generator renders randomized bird's-eye lane scenes —
dark track, bright curved lane lines, randomized lighting / white balance /
blur matching the reference's augmentation intent (README.md:2035-2055 HSV
±30 "white balance" robustness) — with exact ground-truth masks.

Pure numpy on the host (data plane), deterministic per (seed, index).
"""

from __future__ import annotations

import numpy as np


def _quadratic_lane(h: int, w: int, rng: np.random.Generator,
                    min_curve: float = 0.0, max_curve: float = 0.4):
    """Sample a quadratic lane centerline x(y) through the image."""
    x0 = rng.uniform(0.2, 0.8) * w
    drift = rng.uniform(-0.3, 0.3) * w
    mag = rng.uniform(min_curve, max_curve)
    curve = mag * w * (1 if rng.random() < 0.5 else -1)
    ys = np.linspace(0.0, 1.0, h)
    xs = x0 + drift * ys + curve * ys**2
    return xs


# Primary scene conditions, matching the reference's per-scene quality table
# (reference README.md:4189-4206: normal / low-light / bright / shadow /
# rain / curves; "blur" is our extra motion-blur bucket).
SCENES = ("normal", "low_light", "bright", "blur", "shadow", "rain", "curve")
_SCENE_PROBS = (0.28, 0.12, 0.12, 0.12, 0.12, 0.12, 0.12)


def _cast_shadow(img: np.ndarray, rng: np.random.Generator):
    """Darken 1-2 soft-edged half-plane bands (cast shadow occlusion).
    Returns the scalar attenuation map so the photometric label threshold
    can account for it (see generate_sample's light map)."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    gain = np.ones((h, w), np.float32)
    for _ in range(rng.integers(1, 3)):
        theta = rng.uniform(0, 2 * np.pi)
        nx, ny = np.cos(theta), np.sin(theta)
        c = rng.uniform(0.25, 0.75) * (nx * w + ny * h)
        width = rng.uniform(0.15, 0.45) * min(h, w)
        d = nx * xx + ny * yy - c
        inside = np.clip(0.5 - d / max(width, 1.0), 0.0, 1.0)  # soft edge
        factor = rng.uniform(0.35, 0.6)
        gain *= 1.0 - inside * (1.0 - factor)
    img *= gain[..., None]
    return img, gain


def _sample_wedge_params(rng: np.random.Generator) -> tuple:
    """Black IPM warp-border wedges: decision + geometry.

    Production frames reach the model through the perspective warp, which
    leaves V-shaped invalid (black) regions at the bottom corners — every
    real bird's-eye frame the reference publishes shows them
    (assets/demo/normal_raw.jpg, IPM.jpg). Round-3 real-frame scoring
    found the model, never having seen wedges, hallucinating lane pixels
    along the black border (golden-frame production-path IoU 0.51); this
    augmentation teaches border = background. Geometry randomized around
    the real trapezoid: each wedge's hypotenuse runs from the side edge at
    30-70% height down to 30-70% of the bottom edge.

    Sampled at a scene-independent point in the RNG stream (scene branches
    consume different draw counts, and the wedge decision must not flip
    between forced scene renders of one index)."""
    return (rng.random() < 0.35,
            rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.5),
            rng.uniform(0.3, 0.7), rng.uniform(0.5, 0.7),
            rng.uniform(0.0, 5.0))


def _wedge_region(shape: tuple, params: tuple) -> np.ndarray:
    _, fy_l, fx_l, fy_r, fx_r, _ = params
    h, w = shape
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    y_l, x_lc = fy_l * h, fx_l * w
    t = np.clip(xx / max(x_lc, 1.0), 0.0, 1.0)
    left = (xx <= x_lc) & (yy >= y_l + (h - y_l) * t)
    y_r, x_rc = fy_r * h, fx_r * w
    t = np.clip((w - 1 - xx) / max(w - 1 - x_rc, 1.0), 0.0, 1.0)
    right = (xx >= x_rc) & (yy >= y_r + (h - y_r) * t)
    return left | right


def _apply_wedges(img: np.ndarray, mask: np.ndarray, params: tuple):
    wedge = _wedge_region(img.shape[:2], params)
    img[wedge] = params[5]
    mask[wedge] = False
    return img, mask


def _rain_overlay(img: np.ndarray, rng: np.random.Generator):
    """Specular rain: bright streaks + droplet highlights + wet-sheen noise."""
    h, w = img.shape[:2]
    angle = rng.uniform(-0.35, 0.35)  # streaks near-vertical
    n_streaks = int(rng.integers(20, 60))
    length = max(3, int(rng.uniform(0.04, 0.10) * h))
    for _ in range(n_streaks):
        x0 = rng.integers(0, w)
        y0 = rng.integers(0, h - length)
        ys = np.arange(length)
        xs = np.clip((x0 + angle * ys).astype(int), 0, w - 1)
        img[y0 + ys, xs] += rng.uniform(25, 70)
    # droplets: small bright discs (lens/water highlights)
    yy, xx = np.ogrid[:h, :w]
    for _ in range(rng.integers(3, 9)):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(1, max(2, h // 50) + 1)
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
        img[blob] += rng.uniform(30, 80)
    # wet sheen: raise noise floor + mild desaturation toward gray
    gray = img.mean(-1, keepdims=True)
    img += (gray - img) * rng.uniform(0.1, 0.3)
    img += rng.normal(0, rng.uniform(4, 9), size=img.shape)
    return img


def _draw_line(mask: np.ndarray, xs: np.ndarray, width: float):
    h, w = mask.shape
    cols = np.arange(w)[None, :]
    dist = np.abs(cols - xs[:, None])
    mask |= dist <= (width / 2)
    return mask


def _line_alpha(shape: tuple, xs: np.ndarray, width: float,
                soft_frac: float = 0.0) -> np.ndarray:
    """Coverage profile of one stripe: 1 in the core, linear falloff over
    the outer ``soft_frac`` of the half-width (0 = hard edge, the round-3
    behavior)."""
    h, w = shape
    cols = np.arange(w, dtype=np.float32)[None, :]
    dist = np.abs(cols - xs[:, None].astype(np.float32))
    half = max(width / 2.0, 0.5)
    if soft_frac <= 0.0:
        return (dist <= half).astype(np.float32)
    core = half * (1.0 - soft_frac)
    return np.clip((half - dist) / max(half - core, 0.5), 0.0, 1.0)


def _box_blur(img: np.ndarray, k: int) -> np.ndarray:
    kernel = np.ones(2 * k + 1) / (2 * k + 1)
    img = np.apply_along_axis(
        lambda m: np.convolve(m, kernel, mode="same"), 0, img)
    return np.apply_along_axis(
        lambda m: np.convolve(m, kernel, mode="same"), 1, img)


def _lowres_degrade(img: np.ndarray, factor: int) -> np.ndarray:
    """Capture-resolution degradation: block-mean downscale by ``factor``
    then upscale back + smooth — the golden real frame ships 224x224 and
    is consumed at 640x480 through the IPM warp, so the production model
    sees exactly this upscale blur (reference test_images/frame_001410.jpg
    vs src/unet_ros_node.py's 640x480 camera geometry). Works on [H, W]
    and [H, W, C] float arrays."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    hc, wc = h - h % factor, w - w % factor
    small = img[:hc, :wc].reshape(
        hc // factor, factor, wc // factor, factor, c).mean(axis=(1, 3))
    out = img.astype(np.float32).copy()
    out[:hc, :wc] = np.repeat(np.repeat(small, factor, axis=0),
                              factor, axis=1)
    out = _box_blur(out, max(1, factor // 2))
    return out[..., 0] if squeeze else out


def generate_sample(index: int, seed: int = 42, image_size=(224, 224),
                    return_meta: bool = False, scene: str | None = None):
    """Render one (image uint8 RGB [H,W,3], mask float32 [H,W,1]) pair.

    Each sample draws ONE primary scene condition (or takes `scene`):
    normal / low_light / bright / blur / shadow / rain / curve — the same
    six-plus-one bucket structure the reference reports quality for
    (README.md:4189-4206). With return_meta=True also returns
    {'gain', 'wb', 'blurred', 'scene'}.
    """
    h, w = image_size
    rng = np.random.default_rng(np.random.SeedSequence([seed, index]))
    if scene is None:
        scene = str(rng.choice(SCENES, p=_SCENE_PROBS))
    assert scene in SCENES, f"unknown scene {scene!r}"

    # Track background: blue-ish cloth with noise. The range spans dark
    # competition cloth up to the light-blue floor of the reference's real
    # frames (normal_raw.jpg floor ~ RGB(100, 120, 170)); round-3 widened
    # the bright end after real-frame scoring.
    base = np.array([
        rng.uniform(15, 105), rng.uniform(25, 125), rng.uniform(60, 190)
    ])  # RGB, bluish
    base = np.minimum(base, base[2] - np.array([12.0, 6.0, 0.0]))
    img = np.ones((h, w, 3), np.float32) * base
    img += rng.normal(0, rng.uniform(2, 8), size=(h, w, 3))

    # Lane lines: 1-3 bright lines with varying width and brightness.
    # "curve" scenes force strong quadratic curvature; others stay gentler
    # so the bucket is a distinct condition, not a relabeling.
    #
    # Round-4 width model: most stripes stay at the reference's real ~1-6 %
    # of frame width with hard edges, but 25 % of lines render WIDE
    # (5-20 % of w) with a soft-edge coverage profile — the golden real
    # frame's warped far field shows stripes up to ~0.18 w of blur smear
    # (scripts/diag_golden.py: truth width 150-190 px at 1055 w), which the
    # round-3 model had never seen and therefore under-segmented.
    min_c, max_c = (0.25, 0.5) if scene == "curve" else (0.0, 0.2)
    lane_lum = np.zeros((h, w), np.float32)  # clean painted lane luminance
    core = np.zeros((h, w), bool)            # high-coverage stripe cores
    n_lines = rng.integers(1, 4)
    wide_lines = 0
    line_info = []  # per-line painted geometry (for point-label derivation)
    for _ in range(n_lines):
        xs = _quadratic_lane(h, w, rng, min_c, max_c)
        wide = rng.random() < 0.25
        soft = rng.uniform(0.25, 0.5)  # drawn unconditionally: constant
        # per-line draw count keeps the wedge draw scene/width-independent
        if wide:
            width = rng.uniform(0.05, 0.20) * w
            brightness = rng.uniform(190, 255)
            wide_lines += 1
        else:
            # lower bound 0.008: the reference's real lane stripes are ~1%
            # of frame width (normal_raw.jpg), thinner than round-2's floor
            width = rng.uniform(0.008, 0.06) * w
            brightness = rng.uniform(170, 255)
            soft = 0.0
        alpha = _line_alpha((h, w), xs, width, soft)
        color = np.array([brightness, brightness, brightness])
        color += rng.normal(0, 10, size=3)
        img = img * (1.0 - alpha[..., None]) + color * alpha[..., None]
        lane_lum = np.maximum(lane_lum, brightness * alpha)
        core |= alpha >= 0.72
        line_info.append({"xs": xs, "width": float(width),
                          "brightness": float(brightness),
                          "wide": bool(wide)})

    painted = lane_lum > 1.0
    # Distractors: bright patches that are NOT lanes (reflections)
    for _ in range(rng.integers(0, 3)):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(2, max(3, h // 30))
        yy, xx = np.ogrid[:h, :w]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
        img[blob & ~painted] = rng.uniform(140, 200)

    # Wedge decision drawn HERE (scene-independent stream position; see
    # _sample_wedge_params) but painted after lighting below
    wedge_params = _sample_wedge_params(rng)

    # Scene-specific occlusion/weather. Shadow attenuation is tracked in a
    # light map so the halo label below stays photometrically consistent;
    # stripe CORES under shadow/rain remain ground truth, like the
    # reference's real scenes.
    light = np.ones((h, w), np.float32)
    if scene == "shadow":
        img, shade = _cast_shadow(img, rng)
        light *= shade
    elif scene == "rain":
        img = _rain_overlay(img, rng)

    # Global lighting / white balance shifts (the augmentation the reference
    # trains for; README.md:2042-2043)
    if scene == "low_light":
        gain = rng.uniform(0.55, 0.8)
    elif scene == "bright":
        gain = rng.uniform(1.25, 1.5)
    else:
        gain = rng.uniform(0.9, 1.15)
    wb = rng.uniform(0.85, 1.15, size=3)
    img = img * gain * wb
    light *= gain * wb.min()  # lanes are whitish: min channel rules photometry

    # IPM warp-border wedges on a fraction of samples (production frames
    # carry them; painted after lighting — true warp borders are exact
    # black regardless of exposure)
    wedged = bool(wedge_params[0])
    wedge = _wedge_region((h, w), wedge_params) if wedged else None
    if wedged:
        img[wedge] = wedge_params[5]
        lane_lum[wedge] = 0.0
        core[wedge] = False

    # Box blur: always for the "blur" bucket, occasionally elsewhere (mild)
    blurred = scene == "blur" or rng.random() < 0.15
    if blurred:
        k = int(rng.integers(2, 4)) if scene == "blur" else 1
        img = _box_blur(img, k)
        lane_lum = _box_blur(lane_lum[..., None], k)[..., 0]

    # Capture-resolution degradation (golden-frame upscale blur) on a
    # fraction of non-blur-bucket samples; draws happen unconditionally so
    # the stream stays aligned across forced scenes
    deg_draw, factor = rng.random(), int(rng.integers(2, 4))
    degraded = deg_draw < 0.18 and scene != "blur"
    if degraded:
        img = _lowres_degrade(img, factor)
        lane_lum = _lowres_degrade(lane_lum, factor)

    # Label: photometric halo (lane luminance as lit, above the white
    # threshold the real-frame eval uses — eval.real.photometric_lane_truth)
    # UNION the stripe core wherever the clean stripe is still visibly
    # bright. The halo term teaches the blur/upscale width convention the
    # real frames are scored with; the core term keeps lanes under shadow /
    # low light labeled (semantic invariance a pure threshold cannot give).
    mask = (lane_lum * light > 150.0) | (core & (lane_lum > 40.0))
    if wedged:  # blur smears luminance back over the border; border = bg
        mask &= ~wedge

    img = np.clip(img, 0, 255).astype(np.uint8)
    mask = mask.astype(np.float32)[..., None]
    if return_meta:
        meta = {"gain": float(gain), "wb": wb.tolist(), "blurred": blurred,
                "scene": scene, "wedged": wedged, "wide_lines": wide_lines,
                "degraded": degraded, "lines": line_info,
                "wedge_params": wedge_params}
        return img, mask, meta
    return img, mask


def generate_batch(indices, seed: int = 42, image_size=(224, 224)):
    imgs, masks = zip(*(generate_sample(i, seed, image_size) for i in indices))
    return np.stack(imgs), np.stack(masks)


def calibration_indices(num: int, seed: int = 42, image_size=(224, 224),
                        offset: int = 0, pool_factor: int = 4) -> list:
    """Scene-stratified calibration sample selection.

    The reference's RKNN calibration set is quota-balanced across scene
    conditions rather than taken sequentially (reference
    README.md:3313-3336); this renders a pool of `num * pool_factor`
    candidates, buckets them by scene tag, and picks round-robin across
    buckets so every condition (normal / low_light / bright / blur /
    shadow / rain / curve...) is represented.
    """
    buckets: dict[str, list] = {}
    for i in range(offset, offset + num * pool_factor):
        _, _, meta = generate_sample(i, seed, image_size, return_meta=True)
        buckets.setdefault(meta["scene"], []).append(i)
    order = sorted(buckets)  # deterministic bucket rotation
    picked: list[int] = []
    k = 0
    while len(picked) < num and any(buckets.values()):
        scene = order[k % len(order)]
        if buckets[scene]:
            picked.append(buckets[scene].pop(0))
        k += 1
    return picked


class SyntheticLaneDataset:
    """Map-style dataset: len() + [index] -> (uint8 image, float mask).

    With `cache=True` (default) all samples render once on first access and
    epochs reuse them — rendering is host CPU work and must not become the
    training bottleneck (the on-device augmentation provides per-epoch
    variety).
    """

    def __init__(self, num_samples: int, seed: int = 42, image_size=(224, 224),
                 offset: int = 0, cache: bool = True):
        self.num_samples = num_samples
        self.seed = seed
        self.image_size = image_size
        self.offset = offset
        self._cache = None
        if cache:
            self.cache = True
        else:
            self.cache = False

    def _materialize(self):
        if self._cache is None:
            idx = np.arange(self.num_samples) + self.offset
            self._cache = generate_batch(idx, self.seed, self.image_size)
        return self._cache

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int):
        if self.cache:
            imgs, masks = self._materialize()
            return imgs[idx], masks[idx]
        return generate_sample(self.offset + idx, self.seed, self.image_size)

    def batches(self, batch_size: int, shuffle: bool = True,
                rng: np.random.Generator | None = None, drop_last: bool = True):
        order = np.arange(self.num_samples)
        if shuffle:
            (rng or np.random.default_rng(self.seed)).shuffle(order)
        end = (self.num_samples // batch_size * batch_size
               if drop_last else self.num_samples)
        if self.cache:
            imgs, masks = self._materialize()
            for i in range(0, end, batch_size):
                sel = order[i:i + batch_size]
                yield imgs[sel], masks[sel]
        else:
            for i in range(0, end, batch_size):
                idx = order[i:i + batch_size] + self.offset
                yield generate_batch(idx, self.seed, self.image_size)
