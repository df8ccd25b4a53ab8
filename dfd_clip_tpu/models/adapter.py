"""Compression-invariant K/V adapter and its standalone pretrainer.

Re-architecture of CompInvAdapter / CompInvEncoder
(/root/reference/src/models.py:783-1059): per kept encoder layer and per
subject ("k"/"v") a small bottleneck MLP transforms the exported K/V stream,
residual-added by default, trained so that adapted raw features reconstruct
the original raw features while adapted raw and adapted c23 features match.

All struct variants of the reference are supported; shapes are
(B, T, P, H*D) for the MLP and restored to head-split afterwards.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

STRUCT_TYPES = (
    "768-x-768",
    "legacy-768-x-768",
    "768-x-768-nln",
    "768-x-768-ln",
    "768-x-768-z0",
    "768-bn",
    "768-xxx-768",
    "linear",
)


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    struct_type: str = "768-x-768"
    inner_dim: int = 768
    width: int = 768
    num_layers: int = 6  # number of kept encoder layers
    dropout: float = 0.0
    num_frames: int = 50
    patches: int = 196

    @property
    def residual(self) -> bool:
        return self.struct_type != "linear"


def _init_branch(key: jax.Array, cfg: AdapterConfig) -> Params:
    w, x = cfg.width, cfg.inner_dim
    st = cfg.struct_type
    ks = jax.random.split(key, 3)
    if st in ("768-x-768", "legacy-768-x-768", "768-x-768-nln", "768-x-768-ln", "768-x-768-z0"):
        if st == "768-x-768-nln":
            # reference: LayerNorm((patches, inner)) — JOINT normalization
            # over the last two axes with a (P, X) affine (src/models.py:831)
            ln = {
                "scale": jnp.ones((cfg.patches, x), jnp.float32),
                "bias": jnp.zeros((cfg.patches, x), jnp.float32),
            }
        else:
            ln = layers.init_layer_norm(x)
        p = {
            "fc1": layers.init_linear(ks[0], w, x, bias=False),
            "ln": ln,
            "fc2": layers.init_linear(ks[1], x, w, bias=False),
        }
        if st == "768-x-768-z0":
            p["ln"]["scale"] = jnp.zeros_like(p["ln"]["scale"])
            p["fc2"]["w"] = jnp.zeros_like(p["fc2"]["w"])
        return p
    if st == "768-bn":
        return {
            "fc1": layers.init_linear(ks[0], w, w, bias=False),
            "bn": {
                "scale": jnp.ones((cfg.num_frames,), jnp.float32),
                "bias": jnp.zeros((cfg.num_frames,), jnp.float32),
                # BatchNorm2d buffers (torch running stats): used at eval so
                # inference is batch-composition-independent. Never touched
                # by the optimizer (engine/optim.py masks them from weight
                # decay; their grads are structurally zero). Populate via
                # calibrate_bn_stats — CompInvTrainer does so automatically
                # at the end of a 768-bn pretrain run.
                "mean": jnp.zeros((cfg.num_frames,), jnp.float32),
                "var": jnp.ones((cfg.num_frames,), jnp.float32),
            },
        }
    if st == "768-xxx-768":
        return {
            "fc1": layers.init_linear(ks[0], w, x, bias=False),
            "fc2": layers.init_linear(ks[1], x, x, bias=False),
            "fc3": layers.init_linear(ks[2], x, w, bias=False),
        }
    if st == "linear":
        return {"fc1": {"w": jnp.eye(w, dtype=jnp.float32)}}
    raise NotImplementedError(f"Unknown adapter struct: {st}")


def _apply_branch(p: Params, x: jax.Array, cfg: AdapterConfig,
                  rng: Optional[jax.Array], train: bool) -> jax.Array:
    st = cfg.struct_type

    def drop(v, rate, i):
        sub = None if rng is None else jax.random.fold_in(rng, i)
        return layers.dropout(v, rate, sub, train)

    if st == "768-x-768":
        y = layers.linear(p["fc1"], x)
        y = jax.nn.gelu(y)
        y = layers.layer_norm(p["ln"], y)
        y = drop(y, cfg.dropout / 5, 0)
        y = layers.linear(p["fc2"], y)
        return drop(y, cfg.dropout, 1)
    if st == "legacy-768-x-768":
        y = layers.linear(p["fc1"], x)
        y = jax.nn.gelu(y)
        y = layers.layer_norm(p["ln"], y)
        y = layers.linear(p["fc2"], y)
        return drop(y, cfg.dropout, 0)
    if st in ("768-x-768-nln", "768-x-768-ln", "768-x-768-z0"):
        y = layers.linear(p["fc1"], x)
        if st == "768-x-768-nln":
            # LayerNorm((patches, inner)): joint stats over the last TWO
            # axes, (P, X) elementwise affine — exact reference semantics
            # (torch LayerNorm with a 2-D normalized_shape).
            f32 = y.astype(jnp.float32)
            mu = jnp.mean(f32, axis=(-2, -1), keepdims=True)
            var = jnp.var(f32, axis=(-2, -1), keepdims=True)
            y = ((f32 - mu) * jax.lax.rsqrt(var + 1e-5)
                 * p["ln"]["scale"] + p["ln"]["bias"]).astype(y.dtype)
        else:
            y = layers.layer_norm(p["ln"], y)
        y = jax.nn.gelu(y)
        y = drop(y, cfg.dropout / 10, 0)
        y = layers.linear(p["fc2"], y)
        return drop(y, cfg.dropout, 1)
    if st == "768-bn":
        y = layers.linear(p["fc1"], x)
        # BatchNorm2d over the frame axis: batch statistics during training
        # (torch train-mode behavior), stored running statistics at eval —
        # torch eval-mode behavior; per-batch stats at eval would make a
        # video's logits depend on which other clips share its batch.
        if train:
            mean = jnp.mean(y, axis=(0, 2, 3), keepdims=True)
            var = jnp.var(y, axis=(0, 2, 3), keepdims=True)
        else:
            mean = p["bn"]["mean"][None, :, None, None]
            var = p["bn"]["var"][None, :, None, None]
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * p["bn"]["scale"][None, :, None, None] + p["bn"]["bias"][None, :, None, None]
        return drop(y, cfg.dropout, 0)
    if st == "768-xxx-768":
        y = layers.linear(p["fc1"], x)
        y = jax.nn.gelu(y)
        y = drop(y, cfg.dropout / 5, 0)
        y = layers.linear(p["fc2"], y)
        y = jax.nn.gelu(y)
        y = drop(y, cfg.dropout / 5, 1)
        y = layers.linear(p["fc3"], y)
        return drop(y, cfg.dropout, 2)
    if st == "linear":
        y = layers.linear(p["fc1"], x)
        return drop(y, cfg.dropout, 0)
    raise NotImplementedError(st)


def init_adapter(key: jax.Array, cfg: AdapterConfig) -> Params:
    blocks = []
    for i in range(cfg.num_layers):
        lk = jax.random.fold_in(key, i)
        blocks.append({
            "k": _init_branch(jax.random.fold_in(lk, 0), cfg),
            "v": _init_branch(jax.random.fold_in(lk, 1), cfg),
        })
    return {"blocks": blocks}


def apply_adapter(
    params: Params,
    kvs: Dict[str, jax.Array],
    cfg: AdapterConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Adapt {"k","v"}: (Lsel, B, T, P, H, D) per-layer with residual add."""
    out = {}
    for si, subject in enumerate(("k", "v")):
        feats = kvs[subject]
        nsel, b, t, p, h, d = feats.shape
        adapted = []
        for i in range(nsel):
            x = feats[i].reshape(b, t, p, h * d)
            # fold in the subject too: the k- and v-branch dropout masks
            # must be independent (reference: separate torch Dropout
            # modules), not perfectly correlated per layer
            sub = (None if rng is None
                   else jax.random.fold_in(rng, 2 * i + si))
            y = _apply_branch(params["blocks"][i][subject], x, cfg, sub, train)
            y = y.reshape(b, t, p, h, d)
            adapted.append(feats[i] + y if cfg.residual else y)
        out[subject] = jnp.stack(adapted)
    return out


def calibrate_bn_stats(params: Params, kv_batches, cfg: AdapterConfig) -> Params:
    """Populate the 768-bn running statistics from data (one pass).

    torch's BatchNorm2d maintains running stats via momentum-EMA during
    training; the jitted functional train step here cannot mutate buffers,
    so eval-time stats are computed explicitly instead: feed a few batches
    of RAW encoder K/V exports (the adapter's input distribution —
    ``kv_batches``: iterable of {"k","v"}: (Lsel, B, T, P, H, D)) and store
    the population mean/var of each branch's post-fc1 activations per frame
    channel. CompInvTrainer calls this automatically at the end of a 768-bn
    pretrain run; call it manually after scratch-training such an adapter
    inside the Detector."""
    if cfg.struct_type != "768-bn":
        return params
    import numpy as np

    stats = None  # [subject][layer] -> (count, sum, sumsq) per frame channel
    for kvs in kv_batches:
        nsel = kvs["k"].shape[0]
        if stats is None:
            stats = {s: [[0, 0.0, 0.0] for _ in range(nsel)] for s in ("k", "v")}
        for subject in ("k", "v"):
            feats = kvs[subject]
            nsel, b, t, p, h, d = feats.shape
            for i in range(nsel):
                x = feats[i].reshape(b, t, p, h * d)
                y = np.asarray(
                    layers.linear(params["blocks"][i][subject]["fc1"], x),
                    dtype=np.float64,
                )
                st = stats[subject][i]
                st[0] += y.shape[0] * y.shape[2] * y.shape[3]
                st[1] += y.sum(axis=(0, 2, 3))
                st[2] += (y * y).sum(axis=(0, 2, 3))
    if stats is None:
        raise ValueError("calibrate_bn_stats needs at least one batch")

    import jax.numpy as _jnp

    new_blocks = []
    for i, blk in enumerate(params["blocks"]):
        nb = dict(blk)
        for subject in ("k", "v"):
            n, sm, sq = stats[subject][i]
            mean = sm / n
            var = sq / n - mean * mean
            br = dict(nb[subject])
            br["bn"] = dict(br["bn"])
            br["bn"]["mean"] = _jnp.asarray(mean, _jnp.float32)
            br["bn"]["var"] = _jnp.asarray(np.maximum(var, 0.0), _jnp.float32)
            nb[subject] = br
        new_blocks.append(nb)
    return {**params, "blocks": new_blocks}


class CompInvEncoder:
    """Standalone adapter pretrainer (reference src/models.py:943-1046).

    Frozen CLIP -> adapter -> (recon, match) losses over raw/c23 pairs.
    Constructed from a config node; see models.detector.Detector for the
    companion full model. Losses (src/models.py:1002-1040):
      mode 0: recon = ||raw_orig - raw_adapted||, match = ||raw_adapted - c23_adapted||
      mode 1: match = ||raw_orig - c23_adapted||
    each accumulated as mean-over-frames L1 maps then L2-normed per patch.
    """

    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN()
        C.name = "CompInvEncoder"
        C.architecture = "ViT-B/16"
        C.decode_mode = "stride"
        C.decode_stride = 2
        C.decode_indices = []
        C.adapter = CN(new_allowed=True)
        C.dropout = 0.0
        C.mode = 0
        return C

    def __init__(self, config, num_frames: int = 50, compute_dtype=jnp.bfloat16, **_):
        from . import clip_vit
        from .detector import resolve_layer_indices

        self.config = config
        self.vit_cfg = clip_vit.ARCHITECTURES[config.architecture]
        self.layer_indices = resolve_layer_indices(config, self.vit_cfg.layers)
        self.mode = int(config.mode)
        self.num_frames = num_frames
        self.compute_dtype = compute_dtype
        self.adapter_cfg = AdapterConfig(
            struct_type=config.adapter.struct.type,
            inner_dim=int(getattr(config.adapter.struct, "x", self.vit_cfg.width)),
            width=self.vit_cfg.width,
            num_layers=len(self.layer_indices),
            dropout=config.dropout,
            num_frames=num_frames,
            patches=self.vit_cfg.num_patches,
        )

    def init_params(self, key: jax.Array) -> Params:
        from . import clip_vit

        ke, ka = jax.random.split(key)
        return {
            "encoder": clip_vit.init_clip_vision(ke, self.vit_cfg),
            "adapter": init_adapter(ka, self.adapter_cfg),
        }

    def partition_params(self, params: Params) -> Tuple[Params, Params]:
        return {"adapter": params["adapter"]}, {"encoder": params["encoder"]}

    def preprocess(self, x: jax.Array) -> jax.Array:
        """uint8 frames -> resized, CLIP-normalized float on device (same
        transform as the Detector; reference src/models.py:1048-1059)."""
        from ..ops import image_ops
        from .detector import CLIP_MEAN, CLIP_STD

        if jnp.issubdtype(x.dtype, jnp.floating):
            return x
        return image_ops.resize_crop_normalize(
            x, self.vit_cfg.input_resolution, CLIP_MEAN, CLIP_STD
        )

    def predict(self, params: Params, x: jax.Array, *, train: bool = False,
                rng: Optional[jax.Array] = None):
        from . import clip_vit

        x = self.preprocess(x)
        b, t = x.shape[:2]
        kv_raw = clip_vit.clip_vision_kv(
            params["encoder"], x.reshape((b * t,) + x.shape[2:]),
            self.vit_cfg, self.compute_dtype,
            keep_layers=tuple(self.layer_indices), drop_cls=True,
        )
        kv_raw = {
            s: jax.lax.stop_gradient(
                kv_raw[s]
                .reshape(len(self.layer_indices), b, t, self.vit_cfg.num_patches,
                         self.vit_cfg.heads, self.vit_cfg.head_dim)
            )
            for s in ("k", "v")
        }
        kv_adapted = apply_adapter(params["adapter"], kv_raw, self.adapter_cfg,
                                   train=train, rng=rng)
        return kv_adapted, kv_raw

    def forward(self, params: Params, x: jax.Array, comp_is_raw: jax.Array, *,
                train: bool = True, rng: Optional[jax.Array] = None):
        """x: (B, T, 3, H, W) with raw/c23 interleaved pairs; comp_is_raw: (B,)."""
        kvs, _kvs = self.predict(params, x, train=train, rng=rng)
        nsel = len(self.layer_indices)
        b = x.shape[0]
        w = b // 2
        _, _, t, p, h, d = kvs["k"].shape

        # Order each pair as (raw, c23) using the comp flags.
        def pair_order(feats):
            pairs = feats.reshape(nsel, w, 2, t, p, h, d)
            is_raw_first = comp_is_raw.reshape(w, 2)[:, 0]
            sel = is_raw_first[None, :, None, None, None, None].astype(feats.dtype)
            raw = pairs[:, :, 0] * sel + pairs[:, :, 1] * (1 - sel)
            c23 = pairs[:, :, 1] * sel + pairs[:, :, 0] * (1 - sel)
            return raw, c23

        recon_diff = jnp.zeros((t, p, h, d), jnp.float32)
        match_diff = jnp.zeros((t, p, h, d), jnp.float32)
        for subject in ("k", "v"):
            a_raw, a_c23 = pair_order(kvs[subject])
            o_raw, _ = pair_order(_kvs[subject])
            if self.mode == 0:
                recon_diff += jnp.abs(
                    o_raw.astype(jnp.float32) - a_raw.astype(jnp.float32)
                ).sum(axis=(0, 1))
                match_diff += jnp.abs(
                    a_raw.astype(jnp.float32) - a_c23.astype(jnp.float32)
                ).sum(axis=(0, 1))
            elif self.mode == 1:
                match_diff += jnp.abs(
                    o_raw.astype(jnp.float32) - a_c23.astype(jnp.float32)
                ).sum(axis=(0, 1))

        denom = w * nsel * 2
        # L2 norm of per-patch, frame-averaged difference maps / patches
        # (src/models.py:1037-1038).
        recon_loss = jnp.linalg.norm(
            (recon_diff / denom).reshape(p, t, -1).mean(axis=1)
        ) / p
        match_loss = jnp.linalg.norm(
            (match_diff / denom).reshape(p, t, -1).mean(axis=1)
        ) / p
        return recon_loss, match_loss

    def optimizer_spec(self):
        return {"name": "adamw", "weight_decay": 0.01}
