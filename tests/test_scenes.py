"""Per-scene evaluation harness tests."""

import numpy as np

from lanetpu.eval.scenes import evaluate_by_scene
from lanetpu.train.synthetic import generate_sample


def test_sample_meta_tags():
    from lanetpu.train.synthetic import SCENES

    scenes = set()
    for i in range(80):
        _, _, meta = generate_sample(i, seed=9, return_meta=True)
        assert meta["scene"] in SCENES
        scenes.add(meta["scene"])
    # all 7 buckets (incl. the reference's shadow/rain/curves,
    # README.md:4189-4206) appear in a modest pool
    assert scenes == set(SCENES)


def test_forced_scene_conditions_render_distinctly():
    img_n, m_n = generate_sample(3, seed=5, scene="normal")
    img_s, m_s = generate_sample(3, seed=5, scene="shadow")
    img_r, _ = generate_sample(3, seed=5, scene="rain")
    img_l, _ = generate_sample(3, seed=5, scene="low_light")
    img_b, _ = generate_sample(3, seed=5, scene="bright")
    # same geometry (same rng stream up to the scene branch differences is
    # not guaranteed) but conditions must separate in brightness statistics
    assert img_s.mean() < img_n.mean()          # shadow darkens
    assert img_l.mean() < img_n.mean() < img_b.mean()
    assert img_r.astype(float).std() >= img_n.astype(float).std() * 0.8
    assert m_n.sum() > 0 and m_s.sum() > 0      # masks still have lanes


def test_curve_scene_has_strong_curvature():
    # curve-bucket lanes bend far more than normal-bucket lanes on average
    def mean_bend(scene):
        bends = []
        for i in range(8):
            _, mask = generate_sample(100 + i, seed=11, image_size=(64, 64),
                                      scene=scene)
            m = mask[..., 0] > 0.5
            cols = [np.nonzero(row)[0].mean() for row in m if row.any()]
            if len(cols) > 8:
                c = np.asarray(cols)
                lin = np.polyval(np.polyfit(np.arange(len(c)), c, 1),
                                 np.arange(len(c)))
                bends.append(np.abs(c - lin).max())
        return np.mean(bends)

    assert mean_bend("curve") > mean_bend("normal")


def test_meta_consistent_with_plain_sample():
    img1, mask1 = generate_sample(4, seed=9)
    img2, mask2, _ = generate_sample(4, seed=9, return_meta=True)
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(mask1, mask2)


def test_evaluate_by_scene_oracle():
    """An oracle predictor (reads the ground truth) scores IoU 1 per scene."""

    def oracle(imgs):
        # reconstruct masks by thresholding near-white lane pixels is not
        # exact; instead regenerate the ground truth by index — emulate by
        # brightness: lanes are the brightest structures
        out = []
        for img in imgs:
            g = img.astype(np.float32).mean(-1)
            out.append(((g > np.percentile(g, 90)) * 255).astype(np.uint8))
        return np.stack(out)

    report = evaluate_by_scene(oracle, num_samples=16, image_size=(64, 64))
    assert "overall" in report
    assert 0.0 <= report["overall"]["iou"] <= 1.0
    assert sum(v["count"] for k, v in report.items() if k != "overall") == 16


def test_evaluate_by_scene_perfect_predictor():
    from lanetpu.train.synthetic import generate_sample as gen

    captured = {}

    class Perfect:
        def __init__(self):
            self.calls = 0

        def __call__(self, imgs):
            # regenerate the exact masks for the indices we know the harness
            # uses (sequential from offset, balanced scene cycling)
            from lanetpu.train.synthetic import SCENES

            start = self.calls
            out = []
            for j in range(len(imgs)):
                i = start + j
                _, m, _ = gen(i, 43, (64, 64), return_meta=True,
                              scene=SCENES[i % len(SCENES)])
                out.append((m[..., 0] > 0.5).astype(np.uint8) * 255)
            self.calls += len(imgs)
            return np.stack(out)

    report = evaluate_by_scene(Perfect(), num_samples=16,
                               image_size=(64, 64))
    assert report["overall"]["iou"] == 1.0
    for k, v in report.items():
        assert v["iou"] == 1.0
