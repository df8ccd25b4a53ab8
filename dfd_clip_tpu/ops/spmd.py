"""shard_map integration: Pallas kernels on multi-chip meshes.

Pallas custom calls carry no GSPMD partition rules, so under a plain
multi-device ``jit`` the partitioner would replicate their operands —
all-gathering the batch-sharded activation stream and forfeiting the fused
kernels entirely (round-2 gate in ops/attention._backend). The TPU-native
fix is ``jax.shard_map``: inside a shard_map body the program is per-device
by construction, each shard runs the fused kernels on its local batch, and
the only cross-device communication is the math that genuinely needs it.

Two wrappers, both over the runtime's (data, seq) mesh
(runtime/mesh.MeshRuntime registers it at construction):

  * ``spmd_encoder_kv`` — the frozen tower is embarrassingly parallel over
    (batch x frames) (SURVEY.md §5.7): batch shards over ``data``, frames
    over ``seq``, zero collectives inside.
  * ``spmd_decoder_attention`` — the decoder's single-query dual attention
    over the token-sharded K/V stream: each shard runs the Pallas kernel in
    ``partials`` mode (un-normalized numerator / denominator / running max +
    the CoDA sum), and the shards combine EXACTLY with pmax/psum over
    ``seq`` — the one-query degenerate case of ring attention. With
    seq_parallel=1 the psums are identity and the path reduces to pure data
    parallelism.

Replaces what the reference gets from DDP for free — its CUDA kernels stay
usable per-rank under torch DDP (/root/reference/main.py:283-287) — in the
XLA compilation model.

Selection: automatic on TPU when a multi-device mesh is registered
(DFD_SPMD_PALLAS=0 opts out); on CPU the path is opt-in (DFD_SPMD_PALLAS=1)
so tests exercise it explicitly in interpret mode.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from . import attention as attention_ops

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def spmd_pallas_mesh() -> Optional[Mesh]:
    """The mesh to shard_map Pallas kernels over, or None to stay on the
    single-device / GSPMD path."""
    mode = os.environ.get("DFD_SPMD_PALLAS", "auto")
    if mode == "0":
        return None
    if os.environ.get("DFD_ATTENTION_BACKEND", "auto") == "xla":
        return None  # explicit XLA override: GSPMD partitions it cleanly
    if attention_ops.in_local_program():
        return None  # already inside a shard_map body
    from ..runtime import mesh as mesh_rt

    mesh = mesh_rt.current_mesh()
    if mesh is None or mesh.size <= 1:
        return None
    if DATA_AXIS not in mesh.shape or SEQ_AXIS not in mesh.shape:
        return None
    if mode != "1" and jax.default_backend() != "tpu":
        return None
    return mesh


def encoder_shapes_ok(b: int, t: int, mesh: Mesh) -> bool:
    return b % mesh.shape[DATA_AXIS] == 0 and t % mesh.shape[SEQ_AXIS] == 0


def spmd_encoder_kv(
    tower: Callable[[Dict, jax.Array], Dict[str, jax.Array]],
    enc_params: Dict,
    x: jax.Array,
    mesh: Mesh,
) -> Dict[str, jax.Array]:
    """Run ``tower`` (params, (N,3,H,W) frames -> {"k","v"}: (Lsel,N,P,H,D))
    sharded over the mesh: x (B,T,3,H,W) with B over ``data`` and T over
    ``seq``. Returns {"k","v"}: (Lsel,B,T,P,H,D) sharded the same way."""

    def body(p, x_loc):
        with attention_ops.local_program():
            bl, tl = x_loc.shape[:2]
            frames = x_loc.reshape((bl * tl,) + x_loc.shape[2:])
            kvs = tower(p, frames)
            return {
                s: f.reshape((f.shape[0], bl, tl) + f.shape[2:])
                for s, f in kvs.items()
            }

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, SEQ_AXIS)),
        out_specs=P(None, DATA_AXIS, SEQ_AXIS),
        # Pallas calls don't annotate varying-mesh-axes on their outputs yet
        check_vma=False,
    )
    return fn(enc_params, x)


def decoder_shapes_ok(b: int, l: int, mesh: Mesh) -> bool:
    return b % mesh.shape[DATA_AXIS] == 0 and l % mesh.shape[SEQ_AXIS] == 0


def spmd_decoder_attention(
    q_smax: jax.Array,
    q_coda: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    temporal_pos: Optional[jax.Array],
    layer: Optional[int],
    mesh: Mesh,
    return_stats: bool = False,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Sequence-sharded fused decoder attention with exact combine.

    q_*: (B, 1, H, D); k/v: (B, L, H, D) or stacked (Lsel, B, L, H, D) with
    ``layer`` selecting the slot; mask: (B, L); temporal_pos: (L, H, D) or
    None. B shards over ``data``, L over ``seq``.

    ``return_stats``: also return the combined (denominator, running max)
    — each (B, H) f32 — for the stats-based training backward
    (ops/decoder_attention_vjp.py:spmd_decoder_attention_trainable).

    ``k_scale``/``v_scale``: per-row int8_rows dequant scales ((B, L, 1) or
    stacked (Lsel, B, L, 1) f32) — sharded like K/V over (data, seq); the
    per-shard kernel dequantizes its local tile in VMEM exactly as on a
    single chip, and the combine math is scale-free.
    """
    from .pallas_decoder_attention import fused_decoder_attention

    heads, head_dim = q_smax.shape[2], q_smax.shape[3]
    deq = k_scale is not None

    def body(qs, qc, kl, vl, m, *rest):
        rest = list(rest)
        ks = rest.pop(0) if deq else None
        vs = rest.pop(0) if deq else None
        pos = rest[0] if rest else None
        with attention_ops.local_program():
            o_sc, st = fused_decoder_attention(
                qs, qc, kl, vl, m, pos, layer=layer, partials=True,
                k_scale=ks, v_scale=vs,
            )
        b = o_sc.shape[0]
        num_un = o_sc[:, 0].reshape(b, heads, head_dim)   # rel. to local max
        o_c_loc = o_sc[:, 1].reshape(b, heads, head_dim)  # plain sum
        d_loc, m_loc = st[:, 0], st[:, 1]                 # (b, H)
        gmax = jax.lax.pmax(m_loc, SEQ_AXIS)
        r = jnp.exp(m_loc - gmax)                         # shard rescale <= 1
        num = jax.lax.psum(num_un * r[..., None], SEQ_AXIS)
        den = jax.lax.psum(d_loc * r, SEQ_AXIS)
        o_s = num / jnp.maximum(den, 1e-30)[..., None]    # fully-masked -> 0
        o_c = jax.lax.psum(o_c_loc, SEQ_AXIS)
        cd = jnp.bfloat16 if vl.dtype == jnp.int8 else vl.dtype
        out = (0.5 * (o_s + o_c))[:, None].astype(cd)
        if return_stats:
            return out, den, gmax  # den/gmax replicated over seq post-psum
        return out

    stacked = k.ndim == 5
    kv_spec = P(None, DATA_AXIS, SEQ_AXIS) if stacked else P(DATA_AXIS, SEQ_AXIS)
    in_specs = [P(DATA_AXIS), P(DATA_AXIS), kv_spec, kv_spec,
                P(DATA_AXIS, SEQ_AXIS)]
    args = [q_smax, q_coda, k, v, mask]
    if deq:
        in_specs += [kv_spec, kv_spec]
        args += [k_scale, v_scale]
    if temporal_pos is not None:
        in_specs.append(P(SEQ_AXIS))
        args.append(jnp.broadcast_to(
            temporal_pos, (k.shape[2] if stacked else k.shape[1],
                           heads, head_dim)
        ))
    out_specs = ((P(DATA_AXIS),) * 3) if return_stats else P(DATA_AXIS)
    return jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_vma=False,  # Pallas outputs carry no vma annotations yet
    )(*args)
