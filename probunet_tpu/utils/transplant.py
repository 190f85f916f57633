"""torch -> flax weight transplant (the parity harness, SURVEY.md §7.8).

Maps a PyTorch ``state_dict`` from the reference models onto this framework's
flax param pytrees, converting layouts:

- conv weights   OIHW -> HWIO
- linear weights (out, in) -> (in, out)
- 1D params      copied as-is

Accepts plain ``{name: np.ndarray}`` dicts so torch itself is only needed by
whoever produced the state dict (tests use torch-cpu as the oracle).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _convert(key: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:      # conv OIHW -> HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2:      # linear (out,in) -> (in,out)
        return arr.T
    return arr


def _nest(flat: Mapping[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def _unet_flat(state: Mapping[str, np.ndarray], prefix: str = "") -> Dict[str, np.ndarray]:
    """Flat {flax_path: array} for a reference ``networks.UNet`` state_dict."""
    out: Dict[str, np.ndarray] = {}
    for key, arr in state.items():
        if not key.startswith(prefix):
            continue
        if key.endswith("resample_filter"):
            continue  # non-learned buffer; our resampling is filter-free reshapes
        k = key[len(prefix):]
        arr = np.asarray(arr, dtype=np.float32)
        parts = k.split(".")
        if parts[0] in ("enc", "dec"):
            # torch "enc.64x64_block0.conv0.weight" -> flax "enc_64x64_block0/conv0/weight"
            path = f"{parts[0]}_{parts[1]}/" + "/".join(parts[2:])
        elif parts[0] in ("map_layer0", "map_layer1", "map_label", "map_augment",
                          "out_norm", "out_conv"):
            path = "/".join(parts)
        elif parts[0] == "map_noise":
            continue  # PositionalEmbedding has no params
        else:
            raise KeyError(f"unrecognized UNet key: {key}")
        out[path] = _convert(k, arr)
    return out


def torch_unet_to_flax(state: Mapping[str, np.ndarray]) -> Dict:
    return _nest(_unet_flat(state))


def torch_probunet_to_flax(state: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``prob_unet.ProbabilisticUNet`` state_dict -> flax params."""
    flat: Dict[str, np.ndarray] = {}
    flat.update({f"unet/{k}": v for k, v in _unet_flat(
        {k: v for k, v in state.items() if k.startswith("unet.")}, "unet.").items()})
    for key, arr in state.items():
        arr = np.asarray(arr, dtype=np.float32)
        parts = key.split(".")
        if parts[0] in ("prior", "posterior"):
            if parts[1] == "encoder":
                # nn.Sequential indices 0,3,6,9 are the convs (prob_unet.py:32-38)
                idx = int(parts[2])
                assert idx % 3 == 0
                flat[f"{parts[0]}/enc_{idx // 3}/{parts[3]}"] = _convert(key, arr)
            else:  # conv_mu / conv_log_sigma
                flat[f"{parts[0]}/{parts[1]}/{parts[2]}"] = _convert(key, arr)
        elif parts[0] == "fcomb":
            # nn.Sequential indices 0,2,4 are the convs (prob_unet.py:92-98)
            idx = int(parts[2])
            assert idx % 2 == 0
            flat[f"fcomb/layer{idx // 2}/{parts[3]}"] = _convert(key, arr)
        elif parts[0] == "unet":
            pass
        else:
            raise KeyError(f"unrecognized ProbabilisticUNet key: {key}")
    return _nest(flat)


def assert_tree_shapes_match(ours, theirs, path=""):
    """Recursively check two param pytrees have identical structure/shapes."""
    if isinstance(ours, Mapping) != isinstance(theirs, Mapping):
        raise AssertionError(f"structure mismatch at {path}")
    if isinstance(ours, Mapping):
        if set(ours) != set(theirs):
            raise AssertionError(f"keys differ at {path}: {sorted(ours)} vs {sorted(theirs)}")
        for k in ours:
            assert_tree_shapes_match(ours[k], theirs[k], f"{path}/{k}")
    else:
        if tuple(np.shape(ours)) != tuple(np.shape(theirs)):
            raise AssertionError(f"shape mismatch at {path}: {np.shape(ours)} vs {np.shape(theirs)}")
