"""Encoder-feature analysis CLIs: the reference's visualization notebooks.

CLI replacement for the reference's three analysis notebooks (repo root):

  kv-dist          kv-distribution-visualize.ipynb — per-layer q/k/v/out
                   temporal-variance heatmaps and patch-similarity
                   (cosine-attention) maps for one clip.
  semantic-patches kv-distribution-visualize.ipynb cells 10-12 — collect
                   mean q/k/v/out embeddings at named face regions over N
                   random clips -> misc/semantic_patches.pickle.
  augment-impact   augment-impact-visualize.ipynb — per-layer per-patch KL
                   divergence between two augmentation draws of the same
                   clip (or a c23/raw pair, or two different clips) averaged
                   over N samples -> misc/<setting>.pickle.
  comb-impact      comb-impact-visualize.ipynb — min-max normalize the
                   impact pickles per layer, weighted-combine them (with the
                   reference's optional complement form), renormalize each
                   map to sum 1 -> misc/guide_map.pickle, the prior consumed
                   by the Detector's patch_mask type "guide"
                   (models/detector.py:416-440).

Examples:
  python tools/analysis.py kv-dist --root data/ffpp --video 193_030 \
      --patch-loc 1,7 --out-dir analysis/
  python tools/analysis.py augment-impact --root data/ffpp \
      --settings dev-mode+force-rgb dev-mode+force-hue compression any \
      --num-samples 1000
  python tools/analysis.py comb-impact \
      --inputs misc/compression.pickle misc/dev-mode+force-rgb.pickle \
               misc/dev-mode+force-hue.pickle misc/dev-mode+force-bright.pickle \
               misc/any.pickle \
      --weights 0.25 0.25 0.25 0.25 0 --out misc/guide_map.pickle

All compute runs through the same frozen tower weights the Detector uses
(misc/<arch>.pt when present, random init with a warning otherwise); the
q/k/v export point is the in-projection output and "out" is the full block
output, matching /root/reference/src/clip/model.py:185-227.
"""

from __future__ import annotations

import argparse
import functools
import logging
import pickle
import sys
from os import makedirs, path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import dfd_clip_tpu  # noqa: F401,E402  (platform forcing via JAX_PLATFORMS)
import jax  # noqa: E402

logger = logging.getLogger("analysis")

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

# 14x14-grid face-region patch coordinates (row, col) from the reference's
# kv-distribution-visualize.ipynb cell 10 (aligned-crop geometry).
SEMANTIC_LOCATIONS = {
    "eyes": [[4, 3], [4, 4], [4, 9], [4, 10]],
    "nose": [[7, 6], [6, 6], [5, 6]],
    "lips": [[10, 5], [10, 6], [10, 7]],
    "eyebrows": [[2, 3], [2, 4], [3, 4], [3, 5],
                 [3, 8], [3, 9], [2, 9], [2, 10]],
    "skin": [[0, 6], [0, 7], [1, 6], [1, 7],
             [7, 3], [7, 4], [7, 10], [7, 11],
             [11, 6], [11, 7], [12, 6], [12, 7]],
}

SUBJECTS = ("q", "k", "v", "out")


# -- encoder forward with full q/k/v/out export ------------------------------


def load_encoder(arch: str):
    """(params, cfg) for the frozen tower; converted weights from misc/ when
    present (same candidate paths as main.load_pretrained_encoder)."""
    from dfd_clip_tpu.models import clip_vit, weights as weights_lib

    name = arch.replace("/", "-").replace("@", "-")
    for cand in (f"misc/{name}.pt", f"misc/{name}.npz"):
        if path.isfile(cand):
            params, cfg = weights_lib.load_clip_visual(cand)
            logger.info("Loaded encoder weights from %s", cand)
            return params, cfg
    cfg = clip_vit.ARCHITECTURES[arch]
    logger.warning(
        "No converted checkpoint for %s under misc/; using RANDOM init — "
        "maps will be structurally valid but semantically meaningless.", arch)
    return clip_vit.init_clip_vision(jax.random.key(0), cfg), cfg


@functools.partial(jax.jit, static_argnames=("cfg", "subjects"))
def _export_qkv_out(params, frames_u8, cfg, subjects=SUBJECTS):
    """uint8 (F, 3, H, W) -> {subject: (L, F, P, W)} with CLS dropped.

    Plain lax.scan over the stacked blocks — the analysis path trades the
    production kernels for a forward that also materializes q and the block
    output, the reference's with_q/with_out export
    (/root/reference/src/clip/model.py:236-249).
    """
    import jax.numpy as jnp

    from dfd_clip_tpu.models import clip_vit
    from dfd_clip_tpu.models import layers
    from dfd_clip_tpu.ops import image_ops
    from dfd_clip_tpu.ops.attention import encoder_self_attention_qkv

    x = image_ops.resize_crop_normalize(
        frames_u8, cfg.input_resolution, CLIP_MEAN, CLIP_STD)
    h = clip_vit.embed_patches(params, x, cfg, jnp.float32)
    w = cfg.width

    def block(h, bp):
        y = layers.layer_norm(bp["ln_1"], h)
        qkv = layers.linear(bp["attn"]["in_proj"], y)
        attn = encoder_self_attention_qkv(qkv, cfg.heads, cfg.head_dim)
        h = h + layers.linear(bp["attn"]["out_proj"], attn)
        y2 = layers.layer_norm(bp["ln_2"], h)
        y2 = layers.linear(bp["mlp"]["c_fc"], y2)
        h = h + layers.linear(bp["mlp"]["c_proj"], layers.quick_gelu(y2))
        exports = {"q": qkv[..., :w], "k": qkv[..., w:2 * w],
                   "v": qkv[..., 2 * w:], "out": h}
        return h, {s: exports[s][:, 1:] for s in subjects}  # drop CLS

    _, per_layer = jax.lax.scan(block, h, params["blocks"])
    return per_layer


def extract_features(params, cfg, frames_u8, subjects=SUBJECTS):
    """Host dict {subject: (L, F, P, W) float32} for one clip."""
    out = _export_qkv_out(params, frames_u8, cfg, tuple(subjects))
    return {s: np.asarray(v, np.float32) for s, v in out.items()}


# -- dataset plumbing ---------------------------------------------------------


def build_dataset(args, augmentation, *, pair=False, types=None):
    from dfd_clip_tpu.data.datasets import FFPP

    c = FFPP.get_default_config()
    c.root_dir = args.root
    c.types = list(types or args.types)
    c.compressions = list(args.compressions)
    c.augmentation = augmentation
    c.pair = int(pair)
    c.random_speed = 0
    return FFPP(c, args.num_frames, args.clip_duration, transform=None,
                split="train", seed=args.seed)


def fetch_clip(ds, idx):
    """{comp: (F, 3, H, W) uint8} for clip ``idx`` (fresh augmentation draw
    per call, like indexing the reference dataset twice)."""
    return ds.get_dict(idx, block=True)["frames"]


def locate_video(ds, video_name):
    """First clip index of a named video (notebook cell 2)."""
    for vid_idx, entry in enumerate(ds.video_list):
        if entry[2] == video_name:  # (df_type, comp, name, clips)
            start = 0 if vid_idx == 0 else ds.stack_video_clips[vid_idx - 1]
            return start
    raise SystemExit(f"video {video_name!r} not in the dataset index")


def _grid(cfg):
    return cfg.input_resolution // cfg.patch_size


# -- figures ------------------------------------------------------------------


def save_heat_grid(maps, title, out_png, ncols=None):
    """maps: {row_label: [2D arrays]} -> one PNG grid."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nrows = len(maps)
    ncols = ncols or max(len(v) for v in maps.values())
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(2.2 * ncols, 2.4 * nrows), squeeze=False)
    for r, (label, row) in enumerate(maps.items()):
        for c in range(ncols):
            ax = axes[r][c]
            if c < len(row):
                ax.imshow(row[c])
                ax.set_title(f"{label} L{c}", fontsize=7)
            ax.set_xticks(())
            ax.set_yticks(())
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    logger.info("wrote %s", out_png)


# -- subcommands --------------------------------------------------------------


def cmd_kv_dist(args):
    params, cfg = load_encoder(args.arch)
    g = _grid(cfg)
    ds = build_dataset(args, args.augmentation)
    idx = locate_video(ds, args.video) if args.video else args.index
    frames = fetch_clip(ds, idx)

    makedirs(args.out_dir, exist_ok=True)
    result = {}
    for comp, clip_u8 in frames.items():
        feats = extract_features(params, cfg, clip_u8, args.subjects)
        n_frames = next(iter(feats.values())).shape[1]

        # temporal variance per patch (notebook cell 7): var over frames,
        # mean over width -> (grid, grid) per layer/subject
        variance = {
            s: [f.var(axis=0).mean(axis=-1).reshape(g, g) for f in feats[s]]
            for s in args.subjects
        }
        # patch-similarity attention (cell 8): cosine vs the reference patch
        # of frame 0, /sqrt(W), softmax over patches per frame,
        # -> (grid, F*grid) ribbon per layer/subject
        r, c = args.patch_loc
        loc = r * g + c
        similarity = {}
        for s in args.subjects:
            ribbons = []
            for f in feats[s]:  # (F, P, W)
                ref = f[0, loc]
                sim = (f @ ref) / (
                    np.linalg.norm(f, axis=-1) * np.linalg.norm(ref) + 1e-8)
                sim = sim / np.sqrt(f.shape[-1])
                e = np.exp(sim - sim.max(axis=-1, keepdims=True))
                att = e / e.sum(axis=-1, keepdims=True)  # (F, P)
                ribbons.append(
                    att.reshape(-1, g, g).transpose(1, 0, 2).reshape(g, -1))
            similarity[s] = ribbons
        result[comp] = {"variance": variance, "similarity": similarity}

        if args.figures:
            save_heat_grid(
                variance, f"{comp}: temporal variance (clip {idx})",
                path.join(args.out_dir, f"kv_variance_{comp}.png"))
            for s in args.subjects:
                save_heat_grid(
                    {f"L{i}": [rb] for i, rb in enumerate(similarity[s])},
                    f"{comp}-{s}: patch ({r},{c}) similarity",
                    path.join(args.out_dir, f"kv_similarity_{comp}_{s}.png"),
                    ncols=1)
        logger.info("%s: %d frames, %d layers", comp, n_frames, cfg.layers)

    out_pkl = path.join(args.out_dir, "kv_distribution.pickle")
    with open(out_pkl, "wb") as f:
        pickle.dump(result, f)
    print(f"kv-dist: wrote {out_pkl}"
          + (f" + figures under {args.out_dir}" if args.figures else ""))


def cmd_semantic_patches(args):
    params, cfg = load_encoder(args.arch)
    g = _grid(cfg)
    # region coordinates are authored on the canonical 14x14 grid; rescale
    # for other tower geometries (e.g. ViT-L/14@336px's 24x24)
    locations = {
        k: sorted({min(r * g // 14, g - 1) * g + min(c * g // 14, g - 1)
                   for r, c in v})
        for k, v in SEMANTIC_LOCATIONS.items()
    }
    ds = build_dataset(args, args.augmentation)
    rng = np.random.default_rng(args.seed)

    sums = {s: {k: None for k in locations} for s in args.subjects}
    count = 0
    for i in range(args.num_samples):
        idx = int(rng.integers(0, len(ds)))
        try:
            frames = fetch_clip(ds, idx)
        except Exception as e:  # corrupt clip: resample, like the loader
            logger.warning("sample %d (clip %d) failed: %s", i, idx, e)
            continue
        comp = args.compressions[0]
        first = frames[comp][:1]  # frame 0 only (notebook cell 10)
        feats = extract_features(params, cfg, first, args.subjects)
        for s in args.subjects:
            for name, locs in locations.items():
                region = feats[s][:, 0, locs].mean(axis=1)  # (L, W)
                prev = sums[s][name]
                sums[s][name] = region if prev is None else prev + region
        count += 1
        if (i + 1) % 20 == 0:
            logger.info("semantic-patches: %d/%d", i + 1, args.num_samples)

    if count == 0:
        raise SystemExit("no sample decoded successfully")
    # mean embedding per (subject, region, layer) — the aggregate the
    # notebook's cell-11 similarity pass consumes
    out = {
        s: {k: [sums[s][k][l] / count for l in range(cfg.layers)]
            for k in locations}
        for s in args.subjects
    }
    makedirs(path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"semantic-patches: {count} samples -> {args.out}")


def _kl_map(a, b, g):
    """Per-patch KL(log_softmax(a) || log_softmax(b)) over width, the
    augment-impact metric (notebook cell 8): a, b (P, W) -> (g, g)."""

    def logsoft(x):
        x = x - x.max(axis=-1, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))

    la, lb = logsoft(a), logsoft(b)
    # torch kl_div(input=la, target=lb, log_target=True): exp(lb)*(lb-la)
    kl = np.exp(lb) * (lb - la)
    return kl.mean(axis=-1).reshape(g, g)


def cmd_augment_impact(args):
    params, cfg = load_encoder(args.arch)
    g = _grid(cfg)
    rng = np.random.default_rng(args.seed)
    makedirs(args.out_dir, exist_ok=True)

    for setting in args.settings:
        # three sampling regimes (augment-impact-visualize cells 10-12):
        #   named augmentation  — same clip, two independent draws
        #   "any"               — two different random clips (normal+frame)
        #   "compression"       — same draw replayed across a c23/raw pair
        pair = setting == "compression"
        aug = "normal+frame" if setting in ("any", "compression") else setting
        ds = build_dataset(args, aug, pair=pair)
        acc = {s: np.zeros((cfg.layers, g, g), np.float64)
               for s in ("k", "v")}
        count = 0
        while count < args.num_samples:
            try:
                if pair:
                    frames = fetch_clip(ds, int(rng.integers(0, len(ds))))
                    d1, d2 = frames["c23"][:1], frames["raw"][:1]
                elif setting == "any":
                    d1 = fetch_clip(
                        ds, int(rng.integers(0, len(ds))))["c23"][:1]
                    d2 = fetch_clip(
                        ds, int(rng.integers(0, len(ds))))["c23"][:1]
                else:
                    idx = int(rng.integers(0, len(ds)))
                    d1 = fetch_clip(ds, idx)["c23"][:1]
                    d2 = fetch_clip(ds, idx)["c23"][:1]
            except Exception as e:
                logger.warning("%s: sample failed: %s", setting, e)
                continue
            f1 = extract_features(params, cfg, d1, ("k", "v"))
            f2 = extract_features(params, cfg, d2, ("k", "v"))
            for s in ("k", "v"):
                for l in range(cfg.layers):
                    acc[s][l] += _kl_map(f1[s][l, 0], f2[s][l, 0], g)
            count += 1
            if count % 50 == 0:
                logger.info("%s: %d/%d", setting, count, args.num_samples)

        out = {s: [np.asarray(acc[s][l] / count, np.float32)
                   for l in range(cfg.layers)] for s in ("k", "v")}
        out_pkl = path.join(args.out_dir, f"{setting}.pickle")
        with open(out_pkl, "wb") as f:
            pickle.dump(out, f)
        print(f"augment-impact[{setting}]: {count} samples -> {out_pkl}")


def cmd_comb_impact(args):
    if len(args.weights) != len(args.inputs):
        raise SystemExit("--weights must match --inputs in length")
    data = []
    for file in args.inputs:
        with open(file, "rb") as f:
            data.append(pickle.load(f))
    layers_n = len(data[0]["k"])

    # per-(input, layer, subject) min-max normalization (comb cell 0)
    for d in data:
        for s in ("k", "v"):
            for l in range(layers_n):
                m = np.asarray(d[s][l], np.float64)
                lo, hi = m.min(), m.max()
                d[s][l] = (m - lo) / (hi - lo) if hi > lo else m * 0.0
    if args.invert_last:
        d = data[-1]
        for s in ("k", "v"):
            d[s] = [1.0 - d[s][l] for l in range(layers_n)]

    combined = {}
    for s in ("k", "v"):
        maps = []
        for l in range(layers_n):
            m = sum(w * d[s][l] for w, d in zip(args.weights, data))
            if args.complement:
                # reference cell 3: (2 - weighted sum incl. the "any"
                # term) / 2 — agreement-with-identity form
                m = (2.0 - m) / 2.0
            # each map sums to 1: it is the sampling prior rng.choice(p=...)
            # consumes (models/detector.py:430-439), which needs float64
            maps.append(np.asarray(m, np.float64) / m.sum())
        combined[s] = maps

    makedirs(path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(combined, f)
    if args.figures:
        save_heat_grid(
            {s: combined[s] for s in ("k", "v")}, "guide map",
            path.splitext(args.out)[0] + ".png")
    print(f"comb-impact: wrote {args.out} "
          f"({layers_n} layers, weights {args.weights})")


def main(argv=None):
    logging.basicConfig(level="INFO")
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, dataset=True):
        sp.add_argument("--arch", default="ViT-B/16")
        sp.add_argument("--seed", type=int, default=0)
        if dataset:
            sp.add_argument("--root", required=True, help="FFPP root dir")
            sp.add_argument("--types", nargs="+",
                            default=["REAL", "NT", "DF", "FS", "F2F"])
            sp.add_argument("--compressions", nargs="+", default=["c23"])
            sp.add_argument("--num-frames", type=int, default=20)
            sp.add_argument("--clip-duration", type=int, default=5)

    sp = sub.add_parser("kv-dist", help="per-clip q/k/v/out maps")
    common(sp)
    sp.add_argument("--video", help="video name, e.g. 193_030")
    sp.add_argument("--index", type=int, default=0, help="clip index")
    sp.add_argument("--augmentation", default="none")
    sp.add_argument("--subjects", nargs="+", default=list(SUBJECTS),
                    choices=list(SUBJECTS))
    sp.add_argument("--patch-loc", type=lambda s: tuple(map(int, s.split(","))),
                    default=(1, 7), help="row,col of the reference patch")
    sp.add_argument("--out-dir", default="analysis")
    sp.add_argument("--figures", action="store_true")
    sp.set_defaults(fn=cmd_kv_dist)

    sp = sub.add_parser("semantic-patches",
                        help="mean region embeddings over N clips")
    common(sp)
    sp.add_argument("--augmentation", default="none")
    sp.add_argument("--subjects", nargs="+", default=list(SUBJECTS),
                    choices=list(SUBJECTS))
    sp.add_argument("--num-samples", type=int, default=100)
    sp.add_argument("--out", default="misc/semantic_patches.pickle")
    sp.set_defaults(fn=cmd_semantic_patches)

    sp = sub.add_parser("augment-impact",
                        help="per-layer KL impact maps per setting")
    common(sp)
    sp.add_argument("--settings", nargs="+",
                    default=["dev-mode+force-rgb", "dev-mode+force-hue",
                             "dev-mode+force-bright", "compression", "any"])
    sp.add_argument("--num-samples", type=int, default=1000)
    sp.add_argument("--out-dir", default="misc")
    sp.set_defaults(fn=cmd_augment_impact)

    sp = sub.add_parser("comb-impact", help="combine impact maps -> guide map")
    common(sp, dataset=False)
    sp.add_argument("--inputs", nargs="+", required=True)
    sp.add_argument("--weights", nargs="+", type=float, required=True)
    sp.add_argument("--invert-last", action="store_true",
                    help="use (1 - map) for the last input (the 'any' term)")
    sp.add_argument("--complement", action="store_true",
                    help="reference's (2 - sum)/2 combination form")
    sp.add_argument("--out", default="misc/guide_map.pickle")
    sp.add_argument("--figures", action="store_true")
    sp.set_defaults(fn=cmd_comb_impact)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
