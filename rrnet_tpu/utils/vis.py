"""Detection visualization (reference utils/vis/annotations.py:8-59):
cv2 box drawing with a tab20-style colormap, class-name legend strip,
optional scores."""

from __future__ import annotations

import numpy as np

from rrnet_tpu.data.visdrone import VISDRONE_CLASS_NAMES

# tab20-equivalent RGB palette (matplotlib's tab20, hardcoded so we
# don't need matplotlib at runtime)
_TAB20 = np.asarray([
    (31, 119, 180), (174, 199, 232), (255, 127, 14), (255, 187, 120),
    (44, 160, 44), (152, 223, 138), (214, 39, 40), (255, 152, 150),
    (148, 103, 189), (197, 176, 213), (140, 86, 75), (196, 156, 148),
    (227, 119, 194), (247, 182, 210), (127, 127, 127), (199, 199, 199),
    (188, 189, 34), (219, 219, 141), (23, 190, 207), (158, 218, 229),
], np.uint8)


def visualize(img: np.ndarray, annos: np.ndarray, xywh: bool = True,
              with_score: bool = False,
              class_names=VISDRONE_CLASS_NAMES) -> np.ndarray:
    """Draw (N, >=6) annotation rows on a uint8 HWC image copy."""
    import cv2

    out = np.ascontiguousarray(img.copy())
    for row in np.asarray(annos):
        x, y = int(row[0]), int(row[1])
        if xywh:
            x2, y2 = int(row[0] + row[2]), int(row[1] + row[3])
        else:
            x2, y2 = int(row[2]), int(row[3])
        cls = int(row[5]) % len(_TAB20)
        color = tuple(int(c) for c in _TAB20[cls])
        cv2.rectangle(out, (x, y), (x2, y2), color, 1)
        if with_score and len(row) > 4:
            cv2.putText(out, f"{row[4]:.2f}", (x, max(y - 2, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.3, color, 1)
    # legend strip
    strip = np.zeros((14, out.shape[1], 3), np.uint8)
    x = 2
    for i, name in enumerate(class_names[:11]):
        color = tuple(int(c) for c in _TAB20[i % len(_TAB20)])
        cv2.putText(strip, name, (x, 10), cv2.FONT_HERSHEY_SIMPLEX, 0.3,
                    color, 1)
        x += 8 * len(name)
        if x > out.shape[1] - 60:
            break
    return np.concatenate([out, strip], axis=0)
