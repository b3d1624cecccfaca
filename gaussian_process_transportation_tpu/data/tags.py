"""AprilTag distribution adapters (offline half of ``sensors/tag_detector.py``).

The ROS layer is hardware-bound and out of scope; these functions re-create
its data transformations on plain arrays/dicts:

* a detection is ``{"id": int, "position": (3,), "orientation": (4,) wxyz,
  "size": float}``;
* ``convert_distribution`` matches tag IDs across source/target scans and
  optionally expands each tag into 12 oriented cube corners
  (``tag_detector.py:153-188`` + ``detect_marker_corners`` :282-297);
* ``find_closest_source_to_target`` selects among multiple recorded source
  scans by minimum total displacement (``tag_detector.py:243-280``).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..ops import quaternion as quat
import jax.numpy as jnp


def marker_corners(marker_dimension: float) -> np.ndarray:
    """12 cube-corner offsets for a tag of the given side length
    (``tag_detector.py:282-297``)."""
    h = marker_dimension / 2.0
    base = np.array(
        [[-h, -h], [-h, h], [h, h], [h, -h]], dtype=float
    )
    corners = np.concatenate(
        [
            np.column_stack([base, np.zeros(4)]),
            np.column_stack([base, np.full(4, h)]),
            np.column_stack([base, np.full(4, -h)]),
        ]
    )
    return corners


def convert_distribution(
    source_detections: Sequence[Dict],
    target_detections: Sequence[Dict],
    use_orientation: bool = False,
    scale_factor: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Match tag IDs across scans → paired point sets (+ total displacement)."""
    source_rows, target_rows = [], []
    for s in source_detections:
        for t in target_detections:
            if s["id"] != t["id"]:
                continue
            sp = np.asarray(s["position"], float)
            tp = np.asarray(t["position"], float)
            source_rows.append(sp[None])
            target_rows.append(tp[None])
            if use_orientation:
                for det, pos, rows in ((s, sp, source_rows), (t, tp, target_rows)):
                    R = np.asarray(
                        quat.to_rotation_matrix(jnp.asarray(det["orientation"], dtype=float))
                    )
                    corners = marker_corners(scale_factor * det["size"])
                    rows.append(corners @ R.T + pos)
    if not source_rows:
        return np.zeros((0, 3)), np.zeros((0, 3)), 0.0
    source_array = np.concatenate(source_rows)
    target_array = np.concatenate(target_rows)
    distance = float(np.sum(np.linalg.norm(target_array - source_array, axis=1)))
    return source_array, target_array, distance


def find_closest_source_to_target(
    sources: Sequence[Sequence[Dict]],
    target: Sequence[Dict],
    use_orientation: bool = False,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pick the recorded source scan with minimum total displacement to the
    target scan (multi-source selection, ``tag_detector.py:268-280``)."""
    converted = [
        convert_distribution(s, target, use_orientation=use_orientation) for s in sources
    ]
    index = int(np.argmin([c[2] for c in converted]))
    return converted[index][0], converted[index][1], index
