"""Checkpoint conversion and (de)serialization.

Converts pretrained torch checkpoints into this framework's parameter pytrees:

  * OpenAI CLIP checkpoints (the jit-archive or plain state_dict format the
    reference downloads, /root/reference/src/clip/clip.py:94-194) — only the
    visual tower is used.
  * Meta DINOv2 ``dinov2_vitb14_pretrain.pth`` state dicts
    (src/models.py:368-369), including the one-time bicubic positional-
    embedding interpolation to the working grid
    (dinov2/models/vision_transformer.py:165-189).

Also provides the framework's own checkpoint format: a pickled pure-numpy
pytree (dicts/lists/ndarrays only — no framework objects), written to
``best_weights.pt`` / ``last_weights.pt`` for CLI parity with the reference.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .clip_vit import ViTConfig

Params = Dict[str, Any]


# -- framework-native checkpoints ------------------------------------------------

def to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_params(path: str, tree: Any) -> None:
    with open(path, "wb") as f:
        pickle.dump(to_numpy_tree(tree), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_adapter_checkpoint(path: str, template: Params) -> Params:
    """Load a CompInvEncoder run's adapter weights (src/models.py:472-478)."""
    state = load_params(path)
    if isinstance(state, dict) and "adapter" in state:
        state = state["adapter"]
    # Shape-check against the template.
    jax.tree_util.tree_map(
        lambda a, b: None if np.shape(a) == np.shape(b) else (_ for _ in ()).throw(
            ValueError(f"adapter shape mismatch: {np.shape(a)} vs {np.shape(b)}")
        ),
        state,
        to_numpy_tree(template),
    )
    return jax.tree_util.tree_map(jnp.asarray, state)


# -- torch state-dict loading -----------------------------------------------------

def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy without keeping torch tensors around.

    Handles plain state_dicts, wrapped {'state_dict': ...} checkpoints, and
    TorchScript (jit) archives — the format OpenAI ships CLIP in
    (reference src/clip/clip.py:120-138 falls back the same way)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {
        k: v.detach().float().numpy() for k, v in obj.items() if hasattr(v, "numpy")
    }


def _lin(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    """torch Linear (out,in) -> ours (in,out)."""
    p: Params = {"w": jnp.asarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def convert_clip_visual(sd: Dict[str, np.ndarray], cfg: ViTConfig) -> Params:
    """OpenAI CLIP state_dict (visual.*) -> clip_vit params."""
    pre = "visual." if any(k.startswith("visual.") for k in sd) else ""

    blocks = []
    for i in range(cfg.layers):
        b = f"{pre}transformer.resblocks.{i}"
        blocks.append(
            {
                "ln_1": _ln(sd, f"{b}.ln_1"),
                "attn": {
                    "in_proj": {
                        "w": jnp.asarray(sd[f"{b}.attn.in_proj_weight"].T),
                        "b": jnp.asarray(sd[f"{b}.attn.in_proj_bias"]),
                    },
                    "out_proj": _lin(sd, f"{b}.attn.out_proj"),
                },
                "ln_2": _ln(sd, f"{b}.ln_2"),
                "mlp": {
                    "c_fc": _lin(sd, f"{b}.mlp.c_fc"),
                    "c_proj": _lin(sd, f"{b}.mlp.c_proj"),
                },
            }
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    params: Params = {
        # torch conv OIHW -> HWIO
        "conv1": {"w": jnp.asarray(sd[f"{pre}conv1.weight"].transpose(2, 3, 1, 0))},
        "class_embedding": jnp.asarray(sd[f"{pre}class_embedding"]),
        "positional_embedding": jnp.asarray(sd[f"{pre}positional_embedding"]),
        "ln_pre": _ln(sd, f"{pre}ln_pre"),
        "blocks": stacked,
    }
    # pooled zero-shot path (clip_text.clip_vision_features); the detector's
    # K/V export never touches these, so they are optional in the tree
    if f"{pre}ln_post.weight" in sd:
        params["ln_post"] = _ln(sd, f"{pre}ln_post")
    if f"{pre}proj" in sd:
        params["proj"] = jnp.asarray(sd[f"{pre}proj"])
    return params


def convert_clip_resnet(sd: Dict[str, np.ndarray]) -> Params:
    """OpenAI CLIP RN state_dict (visual.* or bare ModifiedResNet) ->
    clip_resnet params (reference module: src/clip/model.py:94-155)."""
    pre = "visual." if any(k.startswith("visual.") for k in sd) else ""

    def conv(prefix: str) -> Params:
        # torch conv OIHW -> HWIO
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}

    def bnp(prefix: str) -> Params:
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
            "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}.running_var"]),
        }

    params: Params = {
        "stem": {
            "conv1": conv(f"{pre}conv1"), "bn1": bnp(f"{pre}bn1"),
            "conv2": conv(f"{pre}conv2"), "bn2": bnp(f"{pre}bn2"),
            "conv3": conv(f"{pre}conv3"), "bn3": bnp(f"{pre}bn3"),
        }
    }
    for stage in range(1, 5):
        blocks = []
        b = 0
        while f"{pre}layer{stage}.{b}.conv1.weight" in sd:
            base = f"{pre}layer{stage}.{b}"
            blk = {
                "conv1": conv(f"{base}.conv1"), "bn1": bnp(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"), "bn2": bnp(f"{base}.bn2"),
                "conv3": conv(f"{base}.conv3"), "bn3": bnp(f"{base}.bn3"),
            }
            # the downsample Sequential names its stages "-1" (avgpool, no
            # params), "0" (conv), "1" (bn) — model.py:36-41
            if f"{base}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": conv(f"{base}.downsample.0"),
                    "bn": bnp(f"{base}.downsample.1"),
                }
            blocks.append(blk)
            b += 1
        params[f"layer{stage}"] = blocks

    ap = f"{pre}attnpool"
    params["attnpool"] = {
        "positional_embedding": jnp.asarray(sd[f"{ap}.positional_embedding"]),
        "q_proj": _lin(sd, f"{ap}.q_proj"),
        "k_proj": _lin(sd, f"{ap}.k_proj"),
        "v_proj": _lin(sd, f"{ap}.v_proj"),
        "c_proj": _lin(sd, f"{ap}.c_proj"),
    }
    return params


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Params:
    """OpenAI CLIP state_dict (text half) -> clip_text params
    (src/clip/model.py:297-412 parameter surface)."""
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd
        if k.startswith("transformer.resblocks."))
    blocks = []
    for i in range(n_layers):
        b = f"transformer.resblocks.{i}"
        blocks.append(
            {
                "ln_1": _ln(sd, f"{b}.ln_1"),
                "attn": {
                    "in_proj": {
                        "w": jnp.asarray(sd[f"{b}.attn.in_proj_weight"].T),
                        "b": jnp.asarray(sd[f"{b}.attn.in_proj_bias"]),
                    },
                    "out_proj": _lin(sd, f"{b}.attn.out_proj"),
                },
                "ln_2": _ln(sd, f"{b}.ln_2"),
                "mlp": {
                    "c_fc": _lin(sd, f"{b}.mlp.c_fc"),
                    "c_proj": _lin(sd, f"{b}.mlp.c_proj"),
                },
            }
        )
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": jnp.asarray(sd["text_projection"]),
        "logit_scale": jnp.asarray(sd.get("logit_scale", np.float32(2.6592))),
    }


def convert_reference_decoder(sd: Dict[str, np.ndarray], cfg) -> Params:
    """Reference Decoder state_dict -> our decoder params.

    Interop with checkpoints trained by the reference (its Detector saves a
    flat torch state_dict; the decoder lives under ``decoder.*`` there —
    strip the prefix before calling). Key layout differences handled here:

      * The dual-activation in_proj (src/models.py:130-136) reshapes its
        output to (heads, n_act*head_dim) and splits per head, i.e. torch
        columns are per-head [smax | coda] channel pairs. Our decoder splits
        the 2*width output in half first (decoder.py apply_decoder), so the
        columns are permuted to [all-smax | all-coda] head-major order.
      * aug_query parameters (transformer.augment_query_{i}, each (width,))
        are stacked into one (num_blocks-1, width) array.
      * task projections proj{i}x{dim}[_L{layer}] become the nested list.

    ``cfg`` is a decoder.DecoderConfig.
    """
    w, h, d = cfg.width, cfg.heads, cfg.head_dim

    def dual_in_proj(prefix: str) -> Params:
        wt = np.asarray(sd[f"{prefix}.weight"]).T.reshape(w, h, 2, d)
        bt = np.asarray(sd[f"{prefix}.bias"]).reshape(h, 2, d)
        return {
            "w": jnp.asarray(
                np.concatenate(
                    [wt[:, :, 0].reshape(w, w), wt[:, :, 1].reshape(w, w)], axis=1
                )
            ),
            "b": jnp.asarray(
                np.concatenate([bt[:, 0].reshape(w), bt[:, 1].reshape(w)])
            ),
        }

    blocks = []
    for i in range(cfg.num_blocks):
        b = f"transformer.resblocks.{i}"
        blocks.append(
            {
                "ln_1": _ln(sd, f"{b}.ln_1"),
                "attn": {
                    "in_proj": dual_in_proj(f"{b}.attn.in_proj"),
                    "out_proj": _lin(sd, f"{b}.attn.out_proj"),
                },
                "ln_2": _ln(sd, f"{b}.ln_2"),
                "mlp": {
                    "c_fc": _lin(sd, f"{b}.mlp.c_fc"),
                    "c_proj": _lin(sd, f"{b}.mlp.c_proj"),
                },
            }
        )

    params: Params = {
        "class_embedding": jnp.asarray(sd["class_embedding"]),
        "ln_pre": _ln(sd, "ln_pre"),
        "ln_post": _ln(sd, "ln_post"),
        "blocks": blocks,
    }
    if cfg.temporal_position:
        params["positional_embedding"] = jnp.asarray(sd["positional_embedding"])
    if cfg.aug_query:
        params["aug_query"] = jnp.stack(
            [
                jnp.asarray(sd[f"transformer.augment_query_{i}"])
                for i in range(cfg.num_blocks - 1)
            ]
        )

    task_projections = []
    for t, out_dim in enumerate(cfg.out_dims):
        if cfg.global_prediction:
            mats = [
                jnp.asarray(sd[f"proj{t}x{out_dim}_L{l}"]) for l in cfg.layer_indices
            ]
        else:
            mats = [jnp.asarray(sd[f"proj{t}x{out_dim}"])]
        task_projections.append(mats)
    params["task_projections"] = task_projections
    return params


def infer_clip_resnet_config(sd: Dict[str, np.ndarray]):
    """Infer RN architecture from a CLIP state dict — the counts/widths
    logic of the reference's build_model (src/clip/model.py:453-466)."""
    from .clip_resnet import ResNetConfig

    pre = "visual." if any(k.startswith("visual.") for k in sd) else ""
    layers = tuple(
        len({k.split(".")[2 if pre else 1] for k in sd
             if k.startswith(f"{pre}layer{s}.")})
        for s in (1, 2, 3, 4)
    )
    width = sd[f"{pre}conv1.weight"].shape[0] * 2  # stem conv1 is width//2
    embed_dim = width * 32
    pos_tokens = sd[f"{pre}attnpool.positional_embedding"].shape[0]
    spacial = int(round((pos_tokens - 1) ** 0.5))
    return ResNetConfig(
        layers=layers,
        width=width,
        heads=embed_dim // 64,  # vision_heads = vision_width * 32 // 64
        input_resolution=spacial * 32,
        output_dim=sd[f"{pre}attnpool.c_proj.weight"].shape[0],
    )


def infer_clip_vit_config(sd: Dict[str, np.ndarray]) -> ViTConfig:
    """Infer architecture from a CLIP state dict (src/clip/model.py:453-496)."""
    pre = "visual." if any(k.startswith("visual.") for k in sd) else ""
    conv = sd[f"{pre}conv1.weight"]  # (width, 3, patch, patch)
    width, _, patch, _ = conv.shape
    n_layers = len(
        {k.split(".")[3 if pre else 2] for k in sd if f"{pre}transformer.resblocks" in k}
    )
    grid = int(round((sd[f"{pre}positional_embedding"].shape[0] - 1) ** 0.5))
    return ViTConfig(
        input_resolution=grid * patch,
        patch_size=patch,
        width=width,
        layers=n_layers,
        heads=width // 64,
        output_dim=sd[f"{pre}proj"].shape[1] if f"{pre}proj" in sd else width,
    )


def load_clip_visual(path: str) -> tuple[Params, ViTConfig]:
    sd = _load_torch_state_dict(path)
    cfg = infer_clip_vit_config(sd)
    return convert_clip_visual(sd, cfg), cfg


def _interpolate_pos_embed(pos: np.ndarray, target_grid: int) -> jnp.ndarray:
    """(1+S^2, w) -> (1+g^2, w) via bicubic resize of the spatial part."""
    n_tok, w = pos.shape
    src_grid = int(round((n_tok - 1) ** 0.5))
    if src_grid == target_grid:
        return jnp.asarray(pos)
    cls, grid = pos[:1], pos[1:].reshape(src_grid, src_grid, w)
    grid = jax.image.resize(
        jnp.asarray(grid), (target_grid, target_grid, w), method="bicubic"
    )
    return jnp.concatenate([jnp.asarray(cls), grid.reshape(-1, w)], axis=0)


def convert_dinov2(sd: Dict[str, np.ndarray], cfg: ViTConfig) -> Params:
    """DINOv2 pretrain state_dict -> dinov2_vit params (pos-embed resized)."""
    blocks = []
    for i in range(cfg.layers):
        b = f"blocks.{i}"
        if f"{b}.mlp.w12.weight" in sd:
            # fused-SwiGLU checkpoints (giant2; dinov2/layers/swiglu_ffn.py)
            mlp = {"w12": _lin(sd, f"{b}.mlp.w12"), "w3": _lin(sd, f"{b}.mlp.w3")}
        else:
            mlp = {"c_fc": _lin(sd, f"{b}.mlp.fc1"), "c_proj": _lin(sd, f"{b}.mlp.fc2")}
        blocks.append(
            {
                "ln_1": _ln(sd, f"{b}.norm1"),
                "attn": {
                    "in_proj": {
                        "w": jnp.asarray(sd[f"{b}.attn.qkv.weight"].T),
                        "b": jnp.asarray(sd[f"{b}.attn.qkv.bias"]),
                    },
                    "out_proj": _lin(sd, f"{b}.attn.proj"),
                },
                "ls1": jnp.asarray(sd[f"{b}.ls1.gamma"]),
                "ln_2": _ln(sd, f"{b}.norm2"),
                "mlp": mlp,
                "ls2": jnp.asarray(sd[f"{b}.ls2.gamma"]),
            }
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "conv1": {
            "w": jnp.asarray(sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "b": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "class_embedding": jnp.asarray(sd["cls_token"].reshape(-1)),
        "mask_token": jnp.asarray(
            sd["mask_token"].reshape(-1)
        ) if "mask_token" in sd else jnp.zeros((cfg.width,), jnp.float32),
        "positional_embedding": _interpolate_pos_embed(
            sd["pos_embed"].reshape(sd["pos_embed"].shape[-2], -1), cfg.grid
        ),
        "blocks": stacked,
        "ln_post": _ln(sd, "norm"),
    }


def load_dinov2(path: str, cfg: ViTConfig) -> Params:
    return convert_dinov2(_load_torch_state_dict(path), cfg)
