"""Transform-library tests: photometric distortion (incl. lighting-noise
channel swap) and RandomErasing semantics (reference coco_transforms.py
:283-402, :569-608)."""
import random

import numpy as np

from devis_tpu.datasets.transforms import (photometric_distort,
                                           random_erasing_sample)


def test_photometric_distort_shape_range_and_determinism(rng):
    img = (rng.rand(32, 48, 3) * 255).astype(np.float32)
    out1 = photometric_distort(img, random.Random(3))
    out2 = photometric_distort(img, random.Random(3))
    assert out1.shape == img.shape
    assert out1.min() >= 0 and out1.max() <= 255
    np.testing.assert_array_equal(out1, out2)
    # different seeds give different images (over several trials)
    assert any(not np.allclose(photometric_distort(img, random.Random(s)), out1)
               for s in range(4, 10))


def test_photometric_lighting_noise_is_channel_permutation():
    """With only lighting noise active, the output must be an exact channel
    permutation of the input for seeds where the swap fires."""
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 10.0
    img[..., 1] = 100.0
    img[..., 2] = 200.0
    seen_perm = False
    for seed in range(40):
        out = photometric_distort(img, random.Random(seed), contrast=(1, 1),
                                  contrast_post=(1, 1),
                                  saturation=(1, 1), hue_delta=0.0)
        sets = {tuple(np.unique(out[..., c]).round(3)) for c in range(3)}
        assert sets <= {(10.0,), (100.0,), (200.0,)}
        if not np.allclose(out, img, atol=0.5):
            seen_perm = True
    assert seen_perm


def test_photometric_lighting_noise_off():
    img = np.full((4, 4, 3), 50.0, np.float32)
    for seed in range(10):
        out = photometric_distort(img, random.Random(seed), contrast=(1, 1),
                                  contrast_post=(1, 1),
                                  saturation=(1, 1), hue_delta=0.0,
                                  lighting_noise=False)
        np.testing.assert_allclose(out, img, atol=0.5)


def test_random_erasing_erases_and_invalidates(rng):
    img = np.full((40, 60, 3), 128.0, np.float32)
    sample = {
        "image": img,
        "boxes": np.array([[2.0, 2.0, 58.0, 38.0],       # big: survives
                           [25.0, 15.0, 30.0, 20.0]],    # tiny center box
                          np.float32),
        "valid": np.array([True, True]),
    }
    # find a seed where the erase fires and covers the center
    for seed in range(100):
        out = random_erasing_sample(sample, random.Random(seed), p=1.0,
                                    scale=(0.3, 0.33))
        if (out["image"] == 0).any():
            erased = out["image"][..., 0] == 0
            assert erased.mean() >= 0.25  # scale lower bound
            # original image untouched
            assert (sample["image"] > 0).all()
            if not out["valid"][1]:
                assert out["valid"][0]    # big box never dropped at scale 1/3
                return
    raise AssertionError("erase never dropped the center box in 100 seeds")


def test_random_erasing_p_zero_identity(rng):
    sample = {"image": np.ones((10, 10, 3), np.float32),
              "boxes": np.zeros((0, 4), np.float32),
              "valid": np.zeros((0,), bool)}
    out = random_erasing_sample(sample, random.Random(0), p=0.0)
    assert out is sample
