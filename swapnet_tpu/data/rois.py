"""rois.csv loader (reference texture_dataset.py:72-76, pandas-free).

Format: csv with the file id as first column (repeated 12x, one row per
body part) and xmin, ymin, xmax, ymax columns.  Missing values may be the
string "None" -> filled with 0 like the reference.
"""

from __future__ import annotations

import csv
from collections import OrderedDict
from typing import Dict

import numpy as np


def load_rois_csv(path: str) -> Dict[str, np.ndarray]:
    """Returns {file_id: (num_parts, 4) float32}, rows in file order."""
    rows: "OrderedDict[str, list]" = OrderedDict()
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            if not row:
                continue
            key = row[0]
            vals = [0.0 if v in ("None", "", "nan") else float(v) for v in row[1:5]]
            rows.setdefault(key, []).append(vals)
    return {k: np.asarray(v, dtype=np.float32) for k, v in rows.items()}
