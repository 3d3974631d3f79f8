"""normalization_stats.json reader (reference data_utils.py:30-38).

Format: one JSON object per line, e.g.
  {"path": "body", "means": [..3..], "stds": [..3..]}
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple


def get_norm_stats(dataroot: str, key: str) -> Tuple[List[float], List[float]]:
    path = os.path.join(dataroot, "normalization_stats.json")
    if not os.path.isfile(path):
        raise ValueError(f"Could not find 'normalization_stats.json' for {dataroot}")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            if obj.get("path") == key:
                return list(obj["means"]), list(obj["stds"])
    raise KeyError(f"no stats entry for '{key}' in {path}")
