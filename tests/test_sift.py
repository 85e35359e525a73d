"""Built-in SIFT matcher sanity: a translated pattern must yield matches
recovering the translation."""

import numpy as np


def test_sift_matches_translation():
    from faldoi_tpu.matchers.sift import match_descriptors, sift_keypoints

    rng = np.random.RandomState(0)
    base = np.zeros((96, 128), np.float32)
    yy, xx = np.mgrid[0:96, 0:128]
    for _ in range(40):  # high-contrast blobs of varied sizes
        cy, cx = rng.randint(6, 90), rng.randint(6, 122)
        r = rng.uniform(1.5, 4.0)
        base += rng.uniform(80, 255) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)
        )
    base = np.clip(base, 0, 255)
    dx, dy = 3, 2
    img0 = base[8:72, 8:104]
    img1 = base[8 - dy : 72 - dy, 8 - dx : 104 - dx]

    p0, d0 = sift_keypoints(img0, nspo=3)
    p1, d1 = sift_keypoints(img1, nspo=3)
    # the detector is conservative (FALDOI needs few seeds); require a
    # handful of keypoints and consistent matches
    assert len(p0) >= 3 and len(p1) >= 3

    m = match_descriptors(p0, d0, p1, d1)
    assert len(m) >= 2
    flow = m[:, 2:4] - m[:, 0:2]
    med = np.median(flow, axis=0)
    # matched displacement must recover (dx, dy) to within a pixel
    assert abs(med[0] - dx) < 1.0 and abs(med[1] - dy) < 1.0
