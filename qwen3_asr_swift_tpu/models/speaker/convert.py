"""WeSpeaker checkpoint conversion (torch ResNet34 state dict → param tree).

Batch norms fold to scale/shift at load (inference only). Key layout
follows the wespeaker-project ResNet34 release (front.conv1, layerN.M.*,
pooling → seg_1 bottleneck linear).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _fold_bn(sd, prefix, eps=1e-5):
    w = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    m = sd[f"{prefix}.running_mean"]
    v = sd[f"{prefix}.running_var"]
    scale = w / np.sqrt(v + eps)
    return {"scale": scale.astype(np.float32), "bias": (b - m * scale).astype(np.float32)}


def _conv(sd, name):
    return {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)).astype(np.float32)}


def convert_wespeaker(sd: Dict[str, np.ndarray], blocks=(3, 4, 6, 3)) -> dict:
    params = {
        "stem": {"conv": _conv(sd, "front.conv1" if "front.conv1.weight" in sd else "conv1"),
                 "bn": _fold_bn(sd, "front.bn1" if "front.bn1.weight" in sd else "bn1")},
        "stages": [],
    }
    for si, nb in enumerate(blocks):
        stage = []
        for bi in range(nb):
            base = f"layer{si + 1}.{bi}"
            blk = {
                "conv1": _conv(sd, f"{base}.conv1"),
                "bn1": _fold_bn(sd, f"{base}.bn1"),
                "conv2": _conv(sd, f"{base}.conv2"),
                "bn2": _fold_bn(sd, f"{base}.bn2"),
                "stride": 2 if (bi == 0 and si > 0) else 1,
            }
            if f"{base}.downsample.0.weight" in sd:
                blk["down"] = _conv(sd, f"{base}.downsample.0")
                blk["down_bn"] = _fold_bn(sd, f"{base}.downsample.1")
            stage.append(blk)
        params["stages"].append(stage)
    seg = "seg_1" if "seg_1.weight" in sd else "embed"
    params["embed"] = {
        "kernel": np.ascontiguousarray(sd[f"{seg}.weight"].T).astype(np.float32),
        "bias": sd.get(f"{seg}.bias", np.zeros(sd[f"{seg}.weight"].shape[0])).astype(np.float32),
    }
    return params
