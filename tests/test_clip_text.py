"""CLIP text tower + tokenizer: synthetic behavior tests and torch-golden
parity against the reference's own modules (test_torch_golden.py pattern)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfd_clip_tpu.data import tokenizer as tok_lib
from dfd_clip_tpu.models import clip_text, weights as weights_lib
from dfd_clip_tpu.utils.refload import load_reference, load_reference_module

ref = load_reference()


# ---------------------------------------------------------------- tokenizer

def _tiny_tokenizer():
    # merges over the byte symbols of "he" / "llo" etc.
    merges = [("h", "e</w>"), ("l", "l"), ("ll", "o</w>"), ("h", "e"),
              ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>")]
    return tok_lib.ClipTokenizer(merges=merges)


def test_tokenizer_roundtrip_synthetic():
    tk = _tiny_tokenizer()
    ids = tk.encode("hello world")
    assert ids, "no tokens"
    assert tk.decode(ids).strip() == "hello world"
    # merges applied: "he"+"llo</w>" and "worl"+"d</w>" collapse
    assert len(ids) < len("hello world")


def test_tokenize_framing_and_truncate():
    tk = _tiny_tokenizer()
    arr = tok_lib.tokenize(["hello", "hello world hello world"],
                           tokenizer=tk, context_length=6, truncate=True)
    assert arr.shape == (2, 6) and arr.dtype == np.int32
    assert arr[0, 0] == tk.sot and tk.eot in arr[0]
    ends = np.argmax(arr[0])  # EOT is the max id
    assert ends == list(arr[0]).index(tk.eot)
    assert (arr[0, ends + 1:] == 0).all()  # zero padding
    assert arr[1, -1] == tk.eot  # truncated row still EOT-terminated
    with pytest.raises(ValueError):
        tok_lib.tokenize("hello world hello world", tokenizer=tk,
                         context_length=6)


def test_shipped_bpe_table_standalone():
    """The repo ships the 49k merge table (misc/bpe_simple_vocab_16e6.txt.gz,
    public OpenAI CLIP data): the zero-shot text path must work on a clean
    checkout with no reference tree and no DFD_BPE_PATH override."""
    import os

    assert os.path.exists(tok_lib.DEFAULT_BPE_PATH), (
        "misc/bpe_simple_vocab_16e6.txt.gz missing — the tokenizer is not "
        "self-contained")
    tk = tok_lib.ClipTokenizer()  # default path
    assert tk.vocab_size == 49408
    ids = tk.encode("a photo of a real face")
    assert ids and tk.decode(ids).strip() == "a photo of a real face"
    arr = tok_lib.tokenize(["a deepfake video"], tokenizer=tk)
    assert arr.shape == (1, 77) and arr[0, 0] == tk.sot


@pytest.mark.skipif(ref is None, reason="reference tree or torch unavailable")
def test_tokenizer_golden_vs_reference(monkeypatch):
    """Byte-for-byte id agreement with the reference SimpleTokenizer on its
    real 49k merge table (the gz is read as DATA — the oracle input)."""
    # the reference module imports ftfy unconditionally; both sides run
    # with identity mojibake repair so the comparison isolates the BPE.
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        monkeypatch.setitem(sys.modules, "ftfy", stub)
    st = load_reference_module("src/clip/simple_tokenizer.py")
    if st is None:
        pytest.skip("simple_tokenizer.py missing")
    vocab_gz = f"{ref.root}/src/clip/bpe_simple_vocab_16e6.txt.gz"
    theirs = st.SimpleTokenizer(vocab_gz)
    ours = tok_lib.ClipTokenizer(bpe_path=vocab_gz)
    assert ours.vocab_size == len(theirs.encoder) == 49408
    prompts = [
        "a photo of a real face",
        "a DEEPFAKE video, heavily compressed!!",
        "face-swap #42 <|endoftext|> trailing",
        "Grüße, naïve café — touché",
        "  whitespace\t\tand\nnewlines  ",
    ]
    for p in prompts:
        assert ours.encode(p) == theirs.encode(p), p
    ids = ours.encode(prompts[0])
    assert ours.decode(ids) == theirs.decode(ids)


# ---------------------------------------------------------------- text tower

def test_text_encode_shapes_and_pooling():
    cfg = clip_text.ARCHITECTURES["Text-Test"]
    params = clip_text.init_clip_text(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    toks = np.zeros((2, cfg.context_length), np.int32)
    toks[0, :5] = [cfg.vocab_size - 2, 5, 9, 3, cfg.vocab_size - 1]
    toks[1, :3] = [cfg.vocab_size - 2, 7, cfg.vocab_size - 1]
    out = clip_text.clip_text_encode(params, jnp.asarray(toks), cfg)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
    # causality + EOT pooling: tokens AFTER a row's EOT cannot change it
    toks2 = toks.copy()
    toks2[1, 5:8] = [11, 12, 13]
    out2 = clip_text.clip_text_encode(params, jnp.asarray(toks2), cfg)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]),
                               atol=1e-6)
    rng = rng  # noqa: F841


@pytest.mark.skipif(ref is None, reason="reference tree or torch unavailable")
def test_text_encode_torch_golden():
    import torch

    emb, res, vw, vl = 16, 32, 64, 2
    model = ref.clip_model.CLIP(
        embed_dim=emb, image_resolution=res, vision_layers=vl,
        vision_width=vw, vision_patch_size=16, context_length=12,
        vocab_size=64, transformer_width=32, transformer_heads=4,
        transformer_layers=2,
    )
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))
    model = model.float().eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = weights_lib.convert_clip_text(sd)
    cfg = clip_text.TextConfig(context_length=12, vocab_size=64, width=32,
                               heads=4, layers=2, embed_dim=emb)

    rng = np.random.default_rng(1)
    toks = np.zeros((3, 12), np.int64)
    for r in range(3):
        n = rng.integers(2, 10)
        toks[r, 0], toks[r, n + 1] = 62, 63  # sot, eot (max id)
        toks[r, 1 : n + 1] = rng.integers(1, 60, n)

    # The reference's own encode_text/encode_image are dead code (its
    # rewritten Transformer returns K/V dicts and its attention drops the
    # mask — see clip_text_encode's docstring), so the oracle drives the
    # reference BLOCKS directly with their literal batch-first unmasked
    # math, and our side runs causal=False to match it.
    tt = torch.from_numpy(toks)
    with torch.no_grad():
        x = model.token_embedding(tt) + model.positional_embedding
        for blk in model.transformer.resblocks:
            x = blk(x)["out"]
        x = model.ln_final(x)
        want = (x[torch.arange(3), tt.argmax(dim=-1)]
                @ model.text_projection).numpy()
    got = np.asarray(clip_text.clip_text_encode(
        params, jnp.asarray(toks.astype(np.int32)), cfg, causal=False))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # pooled visual features + the zero-shot pairing, same checkpoint
    vcfg = weights_lib.infer_clip_vit_config(
        {k[len("visual."):]: v for k, v in sd.items()
         if k.startswith("visual.")})
    vparams = weights_lib.convert_clip_visual(sd, vcfg)
    assert "ln_post" in vparams and "proj" in vparams
    imgs = rng.normal(size=(2, 3, res, res)).astype(np.float32)
    with torch.no_grad():
        vis = model.visual
        xo = vis(torch.from_numpy(imgs), with_out=True)[-1]["out"]
        want_img = (vis.ln_post(xo[:, 0]) @ vis.proj).numpy()
    got_img = np.asarray(clip_text.clip_vision_features(
        vparams, jnp.asarray(imgs), vcfg))
    np.testing.assert_allclose(got_img, want_img, atol=2e-4)

    with torch.no_grad():
        wi = torch.from_numpy(want_img)
        wt = torch.from_numpy(want)
        wi = wi / wi.norm(dim=-1, keepdim=True)
        wt = wt / wt.norm(dim=-1, keepdim=True)
        want_li = (model.logit_scale.exp() * wi @ wt.t()).numpy()
    got_li = np.asarray(clip_text.zero_shot_logits(
        jnp.asarray(got_img), jnp.asarray(got),
        jnp.asarray(sd["logit_scale"])))
    np.testing.assert_allclose(got_li, want_li, atol=2e-3)
