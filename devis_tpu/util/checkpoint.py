"""Checkpoint I/O: torch→JAX conversion, weight adaptation, orbax save/load.

Three reference subsystems live here:
  * torch→flax converter — consumes the reference's released `.pth` state
    dicts (name mapping + weight transposes).
  * weight adaptation (reference `src/util/weights_loading_utils.py`):
    `shift_class_neurons` (L10-24), `adapt_weights_mask_head` (L27-49), and
    `adapt_weights_devis` (L52-183) — temporal params cloned from spatial
    ones, COCO→YT-VIS class-logit transplant, query-embedding subsampling.
    All adaptation operates on the flat torch-style dict (numpy) *before*
    conversion, exactly mirroring the reference's tensor views.
  * orbax checkpointing for native train state.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import jax
import numpy as np

IDS_COCO_TO_YVIS = np.array(
    [1, -1, -1, -1, 41, -1, 3, 18, -1, -1, -1, -1, -1, 17, 21, -1, 7, 19, -1,
     23, -1, 4, -1, -1, -1, -1, 42, 5, 8, 24, -1, 22, 36, 9, -1, 74, -1, -1,
     -1, -1, -1])


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: numpy} dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


# ---------------------------------------------------------------------------
# Weight adaptation on the flat torch-style dict
# ---------------------------------------------------------------------------

def shift_class_neurons(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rotate class logits so label 0 sits at neuron 0 (reference L10-24)."""
    out = {}
    for k, v in state.items():
        if "class_embed" in k:
            r = v.copy()
            r[:-1] = v[1:]
            r[-1] = v[0]
            out[k] = r
        else:
            out[k] = v
    return out


def prefix_def_detr(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Prefix a plain-DETR checkpoint for the segmentation wrapper
    (reference adapt_weights_mask_head, L27-49)."""
    out = {}
    for k, v in state.items():
        if (not k.startswith("def_detr") and "bbox_attention" not in k
                and "mask_head" not in k):
            out[f"def_detr.{k}"] = v
        else:
            out[k] = v
    return out


def adapt_weights_devis(state: Dict[str, np.ndarray],
                        model_keys: Dict[str, Tuple[int, ...]],
                        lvl_res: int, focal_loss: bool,
                        finetune_class_logits: bool, num_frames: int,
                        finetune_query_embds: bool,
                        finetune_temporal_modules: bool,
                        enc_connect_all_frames: bool,
                        enc_temporal_window: int,
                        enc_n_temporal_points: int,
                        dec_n_temporal_points: int) -> Dict[str, np.ndarray]:
    """COCO/image checkpoint → DeVIS surgery (reference L52-183).

    model_keys: {torch-style key: shape} of the target DeVIS model. Returns a
    dict covering the keys it could fill (missing ones stay at init)."""
    ckpt: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        if "def_detr" not in k and any(s in k for s in (
                "transformer", "class_embed", "bbox_embed", "input_proj",
                "query_embed", "backbone")):
            ckpt[f"def_detr.{k}"] = v
            if lvl_res == 1 and "input_proj.2" in k:
                name = "def_detr." + k.split(".")[0] + ".0." + ".".join(k.split(".")[2:])
                ckpt[name] = v.copy()
        else:
            ckpt[k] = v
        # Clone spatial attention params into the temporal ones (L75-86).
        if finetune_temporal_modules and (
                ("transformer.encoder" in k and "self_attn" in k)
                or ("transformer.decoder" in k and "cross_attn" in k)) \
                and "value_proj" not in k and "output_proj" not in k:
            parts = k.split(".")
            idx = 6 if "def_detr" in k else 5
            name = ".".join(parts[:idx]) + ".temporal_" + ".".join(parts[idx:])
            if "def_detr" not in k:
                name = "def_detr." + name
            ckpt[name] = v.copy()

    out: Dict[str, np.ndarray] = {}
    for k, shape in model_keys.items():
        if (k not in ckpt
                or ("query_embed" in k and not finetune_query_embds)
                or ("class_embed" in k and not finetune_class_logits)):
            continue                                      # stays at init
        v = ckpt[k]
        if "query_embed" in k and finetune_query_embds:
            n_traj = shape[0] // num_frames
            if n_traj < v.shape[0]:
                assert v.shape[0] % n_traj == 0
                step = v.shape[0] // n_traj
                picked = v[::step][:shape[0]]
                out[k] = np.tile(picked, (num_frames, 1))
            elif n_traj == v.shape[0]:
                out[k] = v
            else:
                raise NotImplementedError
        elif tuple(v.shape) != tuple(shape):
            if "level_embed" in k:
                out[k] = v[:shape[0]]
            elif "temporal" in k and finetune_temporal_modules:
                if "transformer.encoder" in k:
                    W = num_frames - 1 if enc_connect_all_frames else enc_temporal_window
                    Pt = enc_n_temporal_points
                else:
                    W = num_frames - 1
                    Pt = dec_n_temporal_points
                if "sampling_offsets" in k:
                    if "bias" not in k:
                        t = np.tile(v.reshape(8, 1, 4, 4, 2, 256), (1, W, 1, 1, 1, 1))
                        out[k] = t[:, :, :lvl_res, :Pt].reshape(-1, 256)
                    else:
                        t = np.tile(v.reshape(8, 1, 4, 4, 2), (1, W, 1, 1, 1))
                        out[k] = t[:, :, :lvl_res, :Pt].reshape(-1)
                else:
                    if "bias" not in k:
                        t = np.tile(v.reshape(8, 1, 4, 4, 256), (1, W, 1, 1, 1))
                        out[k] = t[:, :, :lvl_res, :Pt].reshape(-1, 256)
                    else:
                        t = np.tile(v.reshape(8, 1, 4, 4), (1, W, 1, 1))
                        out[k] = t[:, :, :lvl_res, :Pt].reshape(-1)
            elif re.search(r"(self_attn|cross_attn)\.attention_weights", k):
                if "bias" not in k:
                    out[k] = v.reshape(8, 4, 4, 256)[:, :lvl_res].reshape(-1, 256)
                else:
                    out[k] = v.reshape(8, 4, 4)[:, :lvl_res].reshape(-1)
            elif re.search(r"(self_attn|cross_attn)\.sampling_offsets", k):
                if "bias" not in k:
                    out[k] = v.reshape(8, 4, 4, 2, 256)[:, :lvl_res].reshape(-1, 256)
                else:
                    out[k] = v.reshape(8, 4, 4, 2)[:, :lvl_res].reshape(-1)
            elif "class_embed" in k:
                ids = IDS_COCO_TO_YVIS[:-1] if focal_loss else IDS_COCO_TO_YVIS
                gather = ids != -1
                logits = ids[gather] - 1
                tmp = np.zeros(shape, v.dtype)
                tmp[gather] = v[logits]
                out[k] = tmp
            else:
                raise NotImplementedError(
                    f"shape mismatch for {k}: model {shape} vs ckpt {v.shape}")
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# flax path <-> torch key mapping
# ---------------------------------------------------------------------------

_IDX_SUFFIX = re.compile(r"^(.*)_(\d+)$")
_IDX_MODULES = ("class_embed", "bbox_embed", "ref_point_embed", "layers",
                "layer1", "layer2", "layer3", "layer4", "downsample")


def _map_component(p: str) -> str:
    if p == "detr":
        return "def_detr"
    if p == "backbone":
        return "backbone.0.body"
    if p == "position_encoding":
        return "backbone.1"
    if p.startswith("encoder_layers_"):
        return f"encoder.layers.{p.rsplit('_', 1)[1]}"
    if p.startswith("decoder_layers_"):
        return f"decoder.layers.{p.rsplit('_', 1)[1]}"
    if p.startswith("input_proj_"):
        return f"input_proj.{p.rsplit('_', 1)[1]}"
    # Swin backbone (reference swin_backbone.py naming)
    if p == "patch_embed_proj":
        return "patch_embed.proj"
    if p == "patch_embed_norm":
        return "patch_embed.norm"
    m = re.match(r"layers_(\d+)_blocks_(\d+)$", p)
    if m:
        return f"layers.{m.group(1)}.blocks.{m.group(2)}"
    m = re.match(r"layers_(\d+)_downsample$", p)
    if m:
        return f"layers.{m.group(1)}.downsample"
    if p.startswith("mlp_fc"):
        return f"mlp.{p.split('_', 1)[1]}"
    m = _IDX_SUFFIX.match(p)
    if m and m.group(1) in _IDX_MODULES:
        return f"{m.group(1)}.{m.group(2)}"
    return p


def flax_path_to_torch_key(module_parts: List[str], leaf_name: str,
                           collection: str) -> str:
    """Map one flax param path to its torch state-dict key."""
    parts = list(module_parts)
    input_proj_member = None
    # Strip our wrapper submodule names (InputProj.conv/.norm, PlainConv.conv).
    if parts and parts[-1] == "conv" and any(p.startswith("input_proj_") for p in parts):
        parts, input_proj_member = parts[:-1], "0"
    elif parts and parts[-1] == "norm" and any(p.startswith("input_proj_") for p in parts):
        parts, input_proj_member = parts[:-1], "1"
    plain_conv = False
    if input_proj_member is None and parts and parts[-1] == "conv" and len(parts) >= 2 and (
            re.match(r"(lay\d+|out_lay|adapter\d+)$", parts[-2]) or parts[-2].startswith("gn")):
        parts = parts[:-1]                                # PlainConv wrapper
        plain_conv = True

    base = ".".join(_map_component(p) for p in parts)
    if input_proj_member is not None:
        base = f"{base}.{input_proj_member}"

    def join(*names):
        return ".".join(n for n in names if n)

    if collection == "frozen":                            # FrozenBN buffers
        return join(base, leaf_name)
    if leaf_name == "query_embed":
        return join(base, "query_embed.weight")
    if leaf_name in ("level_embed", "temporal_embed"):
        return join(base, leaf_name)
    leaf = "weight" if leaf_name in ("kernel", "scale", "weight") else leaf_name
    # MDC stores its regular conv weight/bias directly on our module; a
    # stripped PlainConv wrapper maps straight to the torch Conv2d leaf.
    if not plain_conv and leaf_name in ("weight", "bias") and parts and \
            re.match(r"(lay\d+|out_lay)$", parts[-1]):
        return join(base, f"regular_conv.{leaf}")
    return join(base, leaf)


def _to_flax_layout(arr: np.ndarray, leaf_name: str, target_shape) -> np.ndarray:
    if leaf_name == "kernel" or (leaf_name == "weight" and arr.ndim >= 4):
        if arr.ndim == 2:
            arr = arr.T
        elif arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)               # OIHW -> HWIO
        elif arr.ndim == 5:
            arr = arr.transpose(2, 3, 4, 1, 0)            # conv3d
    if tuple(arr.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch: ckpt {arr.shape} vs model {target_shape}")
    return arr


def torch_to_flax_variables(state: Dict[str, np.ndarray], template,
                            strict: bool = True, verbose: bool = False):
    """Fill a flax variables pytree (template from model.init) from a flat
    torch state dict. Returns (variables, missing_paths, unused_keys)."""
    flat_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    used, missing, new_leaves = set(), [], []

    for path, leaf in flat_leaves:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        collection, parts = keys[0], keys[1:]
        leaf_name, module_parts = parts[-1], parts[:-1]
        arr = None

        is_dec_self_attn = (len(module_parts) >= 2
                            and module_parts[-1] in ("q_proj", "k_proj",
                                                     "v_proj", "out_proj")
                            and module_parts[-2] == "self_attn"
                            and any(p.startswith("decoder_layers_")
                                    for p in module_parts))
        if is_dec_self_attn:
            proj = module_parts[-1]
            base = ".".join(_map_component(p) for p in module_parts[:-1])
            if proj == "out_proj":
                tk = f"{base}.out_proj.{'weight' if leaf_name == 'kernel' else 'bias'}"
                if tk in state:
                    arr, _ = state[tk], used.add(tk)
                    if leaf_name == "kernel":
                        arr = arr.T
            else:
                tk = f"{base}.in_proj_{'weight' if leaf_name == 'kernel' else 'bias'}"
                if tk in state:
                    full = state[tk]
                    C = full.shape[0] // 3
                    i = ("q_proj", "k_proj", "v_proj").index(proj)
                    arr, _ = full[i * C:(i + 1) * C], used.add(tk)
                    if leaf_name == "kernel":
                        arr = arr.T
            if arr is not None and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(f"{'/'.join(parts)}: {arr.shape} vs {leaf.shape}")
        else:
            tk = flax_path_to_torch_key(module_parts, leaf_name, collection)
            if tk in state:
                arr = _to_flax_layout(state[tk], leaf_name, leaf.shape)
                used.add(tk)

        if arr is None:
            missing.append("/".join(str(p) for p in parts))
            new_leaves.append(leaf)
        else:
            new_leaves.append(np.asarray(arr, dtype=np.float32))

    unused = [k for k in state if k not in used]
    if verbose:
        for m in missing:
            print(f"Load {m} from scratch.")
        for u in unused:
            print(f"Ignoring {u} from checkpoint")
    if strict and missing:
        raise KeyError(f"{len(missing)} params missing from checkpoint: "
                       f"{missing[:10]}...")
    return jax.tree_util.tree_unflatten(treedef, new_leaves), missing, unused


def flax_variables_to_torch_keys(template) -> Dict[str, Tuple[int, ...]]:
    """Torch-style key → shape map for a flax template (used by the DeVIS
    weight adaptation, which reasons in torch naming)."""
    flat_leaves, _ = jax.tree_util.tree_flatten_with_path(template)
    out = {}
    for path, leaf in flat_leaves:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        collection, parts = keys[0], keys[1:]
        leaf_name, module_parts = parts[-1], parts[:-1]
        if (len(module_parts) >= 2 and module_parts[-2] == "self_attn"
                and module_parts[-1] in ("q_proj", "k_proj", "v_proj", "out_proj")):
            continue                                      # packed in torch
        tk = flax_path_to_torch_key(module_parts, leaf_name, collection)
        shape = leaf.shape
        if leaf_name == "kernel":
            if len(shape) == 2:
                shape = (shape[1], shape[0])
            elif len(shape) == 4:
                shape = (shape[3], shape[2], shape[0], shape[1])
        elif leaf_name == "weight" and len(shape) == 4:
            shape = (shape[3], shape[2], shape[0], shape[1])
        out[tk] = tuple(shape)
    return out


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
