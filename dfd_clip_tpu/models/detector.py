"""Deepfake video detector (frozen encoder -> K/V export -> temporal decoder).

Re-architecture of the reference Detector (/root/reference/src/models.py:394-780)
as pure functions over parameter pytrees, jit-compiled end to end:

  uint8 frames -> device-side resize/normalize -> frozen ViT (bf16, MXU) with
  per-layer K/V export -> static layer selection -> optional patch-mask gather
  -> optional CompInv adapter -> dual-activation decoder -> L2-normalized
  logits (norm 5) -> per-task losses.

Host-side randomness that the reference drew inside the module (patch-mask
index sampling src/models.py:511-544, triplet combination sampling
src/models.py:706-716) is passed in as explicit index arrays so the whole
step stays a single traced program with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import clip_vit, decoder as decoder_lib, adapter as adapter_lib
from ..ops import image_ops

Params = Dict[str, Any]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# -- loss factories (reference src/models.py:20-45) ---------------------------

def mse(*args, **kwargs):
    """Expectation-vs-bpm squared error over a 140-bin distribution head."""

    def driver(logits: jax.Array, y: jax.Array) -> jax.Array:
        bins = jnp.arange(140, dtype=jnp.float32)
        expect = jax.nn.softmax(logits[:, :140], axis=-1) @ bins
        return jnp.square(expect - y) / 1000.0

    return driver


def kl_div(*args, **kwargs):
    """Elementwise KL(target || softmax(logits)), reduction='none'."""

    def driver(logits: jax.Array, y: jax.Array) -> jax.Array:
        log_q = jax.nn.log_softmax(logits, axis=1)
        y = y.astype(jnp.float32)
        # torch F.kl_div(log_q, p): p * (log p - log q), with 0 log 0 := 0.
        log_p = jnp.where(y > 0, jnp.log(jnp.maximum(y, 1e-38)), 0.0)
        return y * (log_p - log_q)

    return driver


def auc_roc(weight=None, label_smoothing: float = 0.0, *args, **kwargs):
    """Per-sample (optionally weighted / label-smoothed) cross-entropy."""

    def driver(logits: jax.Array, y: jax.Array) -> jax.Array:
        num_classes = logits.shape[-1]
        log_p = jax.nn.log_softmax(logits, axis=-1)
        if y.ndim == 1 and jnp.issubdtype(y.dtype, jnp.integer):
            targets = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
        else:
            targets = y.astype(jnp.float32)
        if label_smoothing:
            targets = targets * (1.0 - label_smoothing) + label_smoothing / num_classes
        if weight is not None:
            w = jnp.asarray(weight, jnp.float32)
            return -jnp.sum(w * targets * log_p, axis=-1)
        return -jnp.sum(targets * log_p, axis=-1)

    return driver


LOSSES = {"mse": mse, "kl_div": kl_div, "auc_roc": auc_roc}


def resolve_layer_indices(config, n_layers: int) -> Tuple[int, ...]:
    """decode_mode stride/index -> kept encoder layers (src/models.py:458-463)."""
    if config.decode_mode == "stride":
        return tuple(range(0, n_layers, config.decode_stride))
    if config.decode_mode == "index":
        return tuple(config.decode_indices)
    raise ValueError(f"Unknown decode mode: {config.decode_mode}")


@dataclasses.dataclass(frozen=True)
class TransformSpec:
    """Device-side input transform: resize-bicubic, center-crop, normalize."""

    size: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]


class Detector:
    """Config-constructed detector; all compute methods are pure in params."""

    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN(new_allowed=True)
        C.name = "Detector"
        C.foundation = "clip"
        C.architecture = "ViT-B/16"
        C.decode_mode = "stride"
        C.decode_stride = 2
        C.decode_indices = []
        C.out_dim = []
        C.losses = []
        C.concat_ref = 0
        C.adapter = CN(new_allowed=True)
        C.adapter.type = "none"
        C.train_mode = CN(new_allowed=True)
        C.op_mode = CN(new_allowed=True)
        C.op_mode.temporal_position = 1
        C.dropout = 0.0
        C.weight_decay = 0.01
        C.optimizer = "sgd"
        return C

    def __init__(self, config, num_frames: int, compute_dtype=jnp.bfloat16, **_):
        assert config.decode_mode in ("stride", "index")
        self.config = config
        self.num_frames = num_frames
        self.compute_dtype = compute_dtype
        self.foundation = config.foundation
        self.train_mode = config.train_mode
        self.op_mode = config.op_mode
        self.out_dim = list(config.out_dim)
        self.optimizer = config.optimizer
        self.weight_decay = config.weight_decay

        if self.foundation in ("clip", "farl"):
            # FaRL is a CLIP-architecture visual tower pretrained on faces —
            # same math/converter, different checkpoint (BASELINE.json slot)
            self.vit_cfg = clip_vit.ARCHITECTURES[config.architecture]
            mean, std = CLIP_MEAN, CLIP_STD
        elif self.foundation == "dinov2":
            from . import dinov2_vit

            self.vit_cfg = dinov2_vit.ARCHITECTURES[config.architecture]
            mean, std = IMAGENET_MEAN, IMAGENET_STD
        else:
            raise NotImplementedError(f"Unknown foundation: {self.foundation}")

        self.transform = TransformSpec(self.vit_cfg.input_resolution, mean, std)
        self.layer_indices = resolve_layer_indices(config, self.vit_cfg.layers)

        self.losses = []
        for loss in config.losses:
            if isinstance(loss, str):
                self.losses.append(LOSSES[loss]())
            else:
                args = dict(loss.args) if "args" in loss else {}
                self.losses.append(LOSSES[loss.name](**args))

        op = config.op_mode
        self.decoder_cfg = decoder_lib.DecoderConfig(
            width=self.vit_cfg.width,
            heads=self.vit_cfg.heads,
            num_frames=num_frames,
            layer_indices=self.layer_indices,
            out_dims=tuple(config.out_dim),
            dropout=config.dropout,
            temporal_position=bool(op.get("temporal_position", 1)),
            attn_mode=tuple(op.attn_mode.split("+")) if "attn_mode" in op else (),
            aug_query=bool(op.get("aug_query", 0)),
            global_prediction=bool(op.get("global_prediction", 0)),
            concat_ref=bool(config.concat_ref),
        )

        self.adapter_type = config.adapter.type
        if self.adapter_type != "none":
            self.adapter_cfg = adapter_lib.AdapterConfig(
                struct_type=config.adapter.struct.type,
                inner_dim=int(getattr(config.adapter.struct, "x", self.vit_cfg.width)),
                width=self.vit_cfg.width,
                num_layers=len(self.layer_indices),
                dropout=config.dropout,
                num_frames=num_frames,
                patches=self.vit_cfg.num_patches,
            )
        else:
            self.adapter_cfg = None

        self.guide_map = None
        if "patch_mask" in self.train_mode and self.train_mode.patch_mask.type == "guide":
            import pickle

            with open(self.train_mode.patch_mask.path, "rb") as f:
                self.guide_map = pickle.load(f)

    # -- params ---------------------------------------------------------------
    def init_params(self, key: jax.Array, encoder_params: Optional[Params] = None) -> Params:
        ke, kd, ka, kr = jax.random.split(key, 4)
        if encoder_params is None:
            if self.foundation in ("clip", "farl"):
                encoder_params = clip_vit.init_clip_vision(ke, self.vit_cfg)
            else:
                from . import dinov2_vit

                encoder_params = dinov2_vit.init_dinov2(ke, self.vit_cfg)
        params: Params = {
            "encoder": encoder_params,
            "decoder": decoder_lib.init_decoder(
                kd, self.decoder_cfg, self._decoder_reference_blocks(encoder_params)
            ),
        }
        if self.adapter_cfg is not None:
            params["adapter"] = adapter_lib.init_adapter(ka, self.adapter_cfg)
            if self.adapter_type == "pretrain":
                from .weights import load_adapter_checkpoint

                params["adapter"] = load_adapter_checkpoint(
                    self.config.adapter.path, params["adapter"]
                )
        if "temporal" in self.train_mode and self.train_mode.temporal == "ranking":
            params["ranking_proj"] = (self.vit_cfg.width ** -0.5) * jax.random.normal(
                kr, (self.vit_cfg.width, 1), jnp.float32
            )
        return params

    def prepare_params(self, params: Params) -> Params:
        """Inference-time param preparation: with op_mode.compute_int8 the
        frozen tower's GEMM weights pre-quantize ONCE here instead of inside
        every jitted predict (clip_vit.prepare_int8_params). Identity
        otherwise. Call after loading a checkpoint; the result is runtime
        state, never saved."""
        if not bool(self.op_mode.get("compute_int8", 0)):
            return params
        return {**params, "encoder": clip_vit.prepare_int8_params(params["encoder"])}

    def _decoder_reference_blocks(self, encoder_params: Params) -> Params:
        """The encoder block pytree used to seed decoder ln/mlp weights."""
        if self.foundation == "clip":
            return encoder_params["blocks"]
        # DINOv2 blocks share the naming {ln_1, ln_2, mlp{c_fc,c_proj}} here
        # (the torch->jax converter maps norm1/fc1/... accordingly).
        return encoder_params["blocks"]

    def partition_params(self, params: Params) -> Tuple[Params, Params]:
        """(trainable, frozen): the encoder never trains (src/models.py:48-51);
        a pretrained adapter may also be frozen (src/models.py:479-480)."""
        trainable = {k: v for k, v in params.items() if k != "encoder"}
        frozen = {"encoder": params["encoder"]}
        if (
            self.adapter_type == "pretrain"
            and self.config.adapter.get("frozen", 0)
            and "adapter" in trainable
        ):
            frozen["adapter"] = trainable.pop("adapter")
        return trainable, frozen

    # -- compute ----------------------------------------------------------------
    def preprocess(self, x: jax.Array) -> jax.Array:
        """uint8 (..., 3, H, W) -> normalized float (..., 3, n, n) on device."""
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x
        return image_ops.resize_crop_normalize(
            x, self.transform.size, self.transform.mean, self.transform.std
        )

    def _kv_int8(self) -> bool:
        return (
            self.foundation in ("clip", "farl")
            and self.op_mode.get("kv_dtype", "auto") == "int8"
        )

    def _kv_rows8(self) -> bool:
        """op_mode.kv_dtype="int8_rows": per-row int8 K/V that stays
        quantized into the decoder (kernel dequantizes per tile) — halves
        K/V HBM traffic on both the export and read sides, unlike "int8"
        which dequantizes at the consumer (capacity only)."""
        return (
            self.foundation in ("clip", "farl")
            and self.op_mode.get("kv_dtype", "auto") == "int8_rows"
        )

    def _tower_kv(self, enc_params: Params, frames: jax.Array,
                  pad_tokens: bool = False) -> Dict[str, jax.Array]:
        """Frozen tower on a flat frame batch: (N,3,H,W) -> (Lsel,N,P,H,D).

        ``pad_tokens``: 8-align the exported patch axis with zero rows
        (P=196 -> 200) so the decoder-side (T, P) token merge is a layout
        bitcast, not a copy — see clip_vit.clip_vision_kv. The decoder masks
        pad tokens (patch_valid)."""
        if self.foundation in ("clip", "farl"):
            # only the kept layers' K/V are materialized (scatter-in-scan);
            # op_mode.kv_dtype=int8 stores them quantized for capacity
            kv_int8 = self._kv_int8()
            rows8 = self._kv_rows8()
            kvs = clip_vit.clip_vision_kv(
                enc_params, frames, self.vit_cfg, self.compute_dtype,
                keep_layers=tuple(self.layer_indices), kv_int8=kv_int8,
                drop_cls=True,
                compute_int8=bool(self.op_mode.get("compute_int8", 0)),
                kv_int8_rows=rows8,
                pad_tokens=pad_tokens,
            )
            if kv_int8:
                kvs = {
                    s: kvs[s].astype(self.compute_dtype)
                    * (kvs[f"{s}_scale"][:, None, None, :, None] / 127.0
                       ).astype(self.compute_dtype)
                    for s in ("k", "v")
                }
            if rows8:
                # keep K/V quantized: scales ride along to the decoder
                return dict(kvs)
        else:
            from . import dinov2_vit

            kvs = dinov2_vit.dinov2_kv(
                enc_params, frames, self.vit_cfg, self.compute_dtype,
                keep_layers=tuple(self.layer_indices), drop_cls=True,
            )
        return {s: kvs[s] for s in ("k", "v")}

    def _dequant_kvs(self, kvs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Materialize float K/V from the int8_rows form (fallback for
        consumers that need float features: adapters, spmd)."""
        if "k_scale" not in kvs:
            return kvs
        return {
            s: (kvs[s].astype(jnp.float32) * kvs[f"{s}_scale"][..., None]
                ).astype(self.compute_dtype)
            for s in ("k", "v")
        }

    def encode_kv(self, params: Params, x: jax.Array,
                  pad_tokens: bool = False) -> Dict[str, jax.Array]:
        """Frozen-encoder K/V: (B,T,3,H,W) -> {"k","v"}: (Lsel,B,T,P,H,D).

        ``pad_tokens``: P is zero-padded to a multiple of 8 (see _tower_kv);
        callers must mask patches >= vit_cfg.num_patches."""
        import functools

        from ..ops import spmd

        b, t = x.shape[:2]
        tower = (functools.partial(self._tower_kv, pad_tokens=True)
                 if pad_tokens else self._tower_kv)
        # Multi-device: run the tower inside shard_map over the (data, seq)
        # mesh so the fused Pallas kernels stay active per shard (the frozen
        # encoder is embarrassingly parallel over batch x frames). kv_int8 is
        # excluded — its per-(layer, head) absmax scales must see the global
        # batch.
        mesh = (None if self._kv_int8() or self._kv_rows8()
                else spmd.spmd_pallas_mesh())
        if mesh is not None and spmd.encoder_shapes_ok(b, t, mesh):
            kvs = spmd.spmd_encoder_kv(tower, params["encoder"], x, mesh)
            return {s: jax.lax.stop_gradient(kvs[s]) for s in ("k", "v")}
        frames = x.reshape((b * t,) + x.shape[2:])
        kvs = tower(params["encoder"], frames)
        out = {}
        for s, feats in kvs.items():
            # CLS is dropped at the export site (drop_cls=True above), so the
            # tower's stack write already has the final (Lsel, N, P, H, D)
            # layout and this is a free reshape, not a full-stream copy.
            # "*_scale" entries (int8_rows) are (Lsel, N, P, 1) and reshape
            # the same way.
            nsel, _, p = feats.shape[:3]
            out[s] = jax.lax.stop_gradient(
                feats.reshape((nsel, b, t, p) + feats.shape[3:]))
        return out

    def predict(
        self,
        params: Params,
        x: jax.Array,
        m: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        patch_indices: Optional[jax.Array] = None,
        with_video_features: bool = False,
        with_adapt_features: bool = False,
    ):
        """Logits for a clip batch. x: (B,T,3,H,W) uint8 or float; m: (B,T) bool."""
        import os as _os

        x = self.preprocess(x)
        # 8-align the exported patch axis so the decoder's (T, P) token
        # merge is a bitcast (saves 2 x 1.78 ms/batch at flagship predict
        # shapes, and the same pair of merge copies inside the train step —
        # round-5 train budget). Adapter models keep the exact-P export:
        # patch-coupled adapter variants (nln joint-LN, BN spatial stats)
        # and the per-patch sync-compression loss (which requires an
        # adapter) must not see pad rows. The decoder masks pad rows as
        # keys (patch_valid) on both the train and predict paths.
        pad_tokens = (
            self.adapter_cfg is None
            and _os.environ.get("DFD_KV_PAD8", "1") != "0"
        )
        kvs = self.encode_kv(params, x, pad_tokens=pad_tokens)

        if patch_indices is not None:
            # (Lsel, num_select) gather on the patch axis (src/models.py:511-544).
            # int8_rows scales (Lsel, B, T, P, 1) gather identically.
            kvs = {
                s: jax.vmap(lambda f, ix: jnp.take(f, ix, axis=2))(
                    feats, patch_indices
                )
                for s, feats in kvs.items()
            }

        if self.adapter_cfg is not None:
            kvs = self._dequant_kvs(kvs)  # adapters consume float K/V
            sub = None if rng is None else jax.random.fold_in(rng, 1)
            kvs = adapter_lib.apply_adapter(
                params["adapter"], kvs, self.adapter_cfg, train=train, rng=sub
            )

        sub = None if rng is None else jax.random.fold_in(rng, 2)
        # patch_valid: with a padded export and no gather, tokens >= the
        # tower's true patch count are zero pad rows to mask as keys. A
        # patch_indices gather selects only real patches, so everything it
        # returns is valid.
        patch_valid = (
            self.vit_cfg.num_patches
            if pad_tokens and patch_indices is None else None
        )
        task_logits, video_features = decoder_lib.apply_decoder(
            params["decoder"], kvs, m, self.decoder_cfg, train=train, rng=sub,
            patch_valid=patch_valid,
        )

        # L2-normalize logits to norm 5 (src/models.py:551-553).
        task_logits = [
            5.0 * t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-10)
            for t in task_logits
        ]

        features = {}
        if with_video_features:
            features["video"] = video_features
        if with_adapt_features:
            if self.adapter_cfg is None:
                raise ValueError("cannot return adaptive features without an adapter")
            features["adapt"] = kvs
        return task_logits, features

    def sample_patch_indices(self, rng: np.random.Generator) -> Optional[np.ndarray]:
        """Host-side patch-mask index sampling (batch/sample/guide modes)."""
        if "patch_mask" not in self.train_mode:
            return None
        pm = self.train_mode.patch_mask
        num_patch = self.vit_cfg.num_patches
        num_select = int(num_patch * pm.ratio)
        nsel = len(self.layer_indices)
        if pm.type == "batch":
            idx = rng.choice(num_patch, num_select, replace=False)
            return np.tile(idx, (nsel, 1))
        if pm.type == "sample":
            return np.stack(
                [rng.choice(num_patch, num_select, replace=False) for _ in range(nsel)]
            )
        if pm.type == "guide":
            return np.stack(
                [
                    rng.choice(
                        num_patch,
                        num_select,
                        replace=False,
                        p=self.guide_map["v"][self.layer_indices[i]].flatten(),
                    )
                    for i in range(nsel)
                ]
            )
        raise NotImplementedError(pm.type)

    def forward(
        self,
        params: Params,
        x: jax.Array,
        y: Sequence[Optional[jax.Array]],
        m: jax.Array,
        comp_is_raw: Optional[jax.Array] = None,
        speed: Optional[jax.Array] = None,
        *,
        train: bool = False,
        single_task: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        patch_indices: Optional[jax.Array] = None,
        triplet_indices: Optional[jax.Array] = None,
    ):
        """Losses + logits. Mirrors reference forward (src/models.py:568-738).

        y: per-task label arrays (None = task inactive this step).
        comp_is_raw: (B,) bool — compression flag per sample.
        triplet_indices: (R, 3) int — host-sampled, speed-ordered triples.
        """
        b, t = x.shape[:2]

        if "ema_frame" in self.op_mode and self.op_mode.ema_frame:
            r = self.op_mode.ema_frame
            xf = self.preprocess(x)
            coef = (1 - r) * r ** jnp.arange(t - 1, -1, -1, dtype=jnp.float32)
            x = jnp.einsum("t,btchw->bchw", coef.astype(xf.dtype), xf)[:, None]
            m = m[:, :1]
            t = 1

        need_adapt = self.adapter_cfg is not None and "compression" in self.train_mode
        task_logits, features = self.predict(
            params,
            x,
            m,
            train=train,
            rng=rng,
            patch_indices=patch_indices,
            with_video_features=True,
            with_adapt_features=need_adapt,
        )
        video_features = features["video"]

        task_losses = [
            loss_fn(logits, labels)
            if labels is not None and (single_task is None or i == single_task)
            else jnp.zeros((b,), jnp.float32)
            for i, (loss_fn, logits, labels) in enumerate(
                zip(self.losses, task_logits, y)
            )
        ]

        if not train:
            return task_losses, task_logits

        other_losses: Dict[str, jax.Array] = {}

        if "compression" in self.train_mode:
            other_losses.update(
                self._compression_losses(
                    video_features, features.get("adapt"), comp_is_raw, b
                )
            )

        if "nerf_raw" in self.train_mode:
            nerf_power = min(self.train_mode.nerf_raw, 0)
            scale = jnp.where(comp_is_raw, nerf_power, 2.0 - nerf_power)
            task_losses = [
                loss * scale.reshape((b,) + (1,) * (loss.ndim - 1))
                for loss in task_losses
            ]

        if "temporal" in self.train_mode:
            if self.train_mode.temporal == "ranking":
                other_losses["speed/rank"] = self._ranking_loss(
                    params, video_features, speed
                )
            elif self.train_mode.temporal == "triplet":
                other_losses["speed/triplet"] = self._triplet_loss(
                    video_features, speed, triplet_indices
                )
            else:
                raise NotImplementedError(self.train_mode.temporal)

        return task_losses, task_logits, other_losses

    # -- aux losses ---------------------------------------------------------------
    def _compression_losses(self, video_features, adapt_kvs, comp_is_raw, b):
        """raw/c23 invariance losses (src/models.py:600-667)."""
        w = b // 2
        mode = self.train_mode.compression

        def pair_order(feats, axis_b):
            """Split interleaved pairs and order (raw, c23) via comp flags."""
            shape = feats.shape
            pairs = feats.reshape(shape[:axis_b] + (w, 2) + shape[axis_b + 1:])
            is_raw_first = comp_is_raw.reshape(w, 2)[:, 0]
            bshape = (1,) * axis_b + (w, 1) + (1,) * (len(shape) - axis_b - 1)
            sel = is_raw_first.reshape(bshape).astype(feats.dtype)
            idx0 = jnp.take(pairs, 0, axis=axis_b + 1)
            idx1 = jnp.take(pairs, 1, axis=axis_b + 1)
            sel = jnp.squeeze(sel, axis=axis_b + 1)
            raw = idx0 * sel + idx1 * (1 - sel)
            c23 = idx1 * sel + idx0 * (1 - sel)
            return raw, c23

        out: Dict[str, jax.Array] = {}
        out["recon"] = jnp.zeros((), jnp.float32)
        if mode == "feature-match":
            # Keep the (B, num_blocks, W) shape under global_prediction: the
            # reference softmaxes each block's feature over W (dim=-1,
            # src/models.py:627-632); flattening to (B, L*W) would normalize
            # across blocks jointly — a different objective.
            raw, c23 = pair_order(video_features.astype(jnp.float32), 0)
            log_p = jax.nn.log_softmax(raw, axis=-1)
            log_q = jax.nn.log_softmax(c23, axis=-1)
            # torch kl_div(log_q, log_p, log_target=True, reduction='mean')
            kl = jnp.exp(log_p) * (log_p - log_q)
            out["match"] = 100.0 * jnp.sum(jnp.mean(kl, axis=tuple(range(1, kl.ndim)))) / w
        elif mode == "sync":
            nsel = len(self.layer_indices)
            total = jnp.zeros((), jnp.float32)
            for s in ("k", "v"):
                feats = adapt_kvs[s].astype(jnp.float32)  # (Lsel,B,T,P,H,D)
                raw, c23 = pair_order(feats, 1)
                log_p = jax.nn.log_softmax(raw, axis=-1)
                log_q = jax.nn.log_softmax(c23, axis=-1)
                kl = jnp.exp(log_p) * (log_p - log_q)
                # mean over all elements per (layer, pair), summed, normalized.
                per = jnp.mean(kl, axis=tuple(range(2, kl.ndim)))  # (Lsel, w)
                total = total + jnp.sum(per) / (w * nsel * 2)
            out["match"] = 100.0 * total
        else:
            raise NotImplementedError(mode)
        return out

    def _ranking_loss(self, params, video_features, speed):
        """Margin-ranking on a learned 1-D projection (src/models.py:684-704)."""
        vf = video_features if video_features.ndim == 2 else video_features[:, -1]
        rank_logits = (vf @ params["ranking_proj"]).squeeze(-1)  # (B,)
        order = jnp.argsort(-speed)
        sorted_logits = rank_logits[order]
        bsz = sorted_logits.shape[0]
        diff = sorted_logits[None, :] - sorted_logits[:, None]  # [i,j] = x_j - x_i
        hinge = jnp.maximum(diff, 0.0)
        upper = jnp.triu(jnp.ones((bsz, bsz), bool), k=1)
        return 0.05 * jnp.sum(jnp.where(upper, hinge, 0.0)) / jnp.sum(upper)

    def _triplet_loss(self, video_features, speed, triplet_indices):
        """Speed-ordered triplet margins (src/models.py:706-733).

        triplet_indices: (R,3) rows ordered fastest->slowest by the host.
        """
        vf = video_features if video_features.ndim == 2 else video_features[:, -1]
        a = vf[triplet_indices[:, 0]]
        p = vf[triplet_indices[:, 1]]
        n = vf[triplet_indices[:, 2]]
        s = speed[triplet_indices]

        def dist(u, v):
            return jnp.linalg.norm(u - v + 1e-6, axis=-1)

        l1 = jnp.maximum(dist(a, p) - dist(a, n) + jnp.abs(s[:, 2] - s[:, 1]), 0.0)
        l2 = jnp.maximum(dist(n, p) - dist(n, a) + jnp.abs(s[:, 1] - s[:, 0]), 0.0)
        rounds = triplet_indices.shape[0]
        return 0.01 * (jnp.sum(l1) + jnp.sum(l2)) / (rounds * 2)

    def optimizer_spec(self):
        return {"name": self.optimizer, "weight_decay": self.weight_decay}
