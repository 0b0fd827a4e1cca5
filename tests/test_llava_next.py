"""LLaVA-Next AnyRes tiling (utils/anyres.py + LlavaNextModel) and the
CIDEr-D / VQAv2 metrics (evaluation/captioning.py) — the model and the
metrics behind every number in the reference's performance curves
(/root/reference/performanceCurves.py:4,22-62)."""

import math

import numpy as np
import jax.numpy as jnp

from qdm_tpu.evaluation.captioning import (cider_d, normalize_answer,
                                           vqa_accuracy)
from qdm_tpu.utils import anyres

RNG = np.random.default_rng(41)


# ------------------------------------------------------------ geometry

def test_select_best_resolution():
    pins = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]
    # wide landscape -> 336x672; portrait -> 672x336; square -> 672x672
    assert anyres.select_best_resolution((300, 600), pins) == (336, 672)
    assert anyres.select_best_resolution((600, 300), pins) == (672, 336)
    assert anyres.select_best_resolution((500, 500), pins) == (672, 672)
    # extreme tall strip -> 1008x336
    assert anyres.select_best_resolution((900, 290), pins) == (1008, 336)


def test_divide_tiles_roundtrip():
    img = RNG.standard_normal((32, 48, 3)).astype(np.float32)
    tiles, grid = anyres.divide_tiles(img, 16)
    assert grid == (2, 3) and tiles.shape == (6, 16, 16, 3)
    # row-major order: tile (i, j) == img block (i, j)
    np.testing.assert_array_equal(tiles[1], img[0:16, 16:32])
    np.testing.assert_array_equal(tiles[3], img[16:32, 0:16])


def test_resize_and_pad_centers():
    img = np.ones((10, 20, 3), np.float32)
    out = anyres.resize_and_pad(img, (32, 32))
    assert out.shape == (32, 32, 3)
    # aspect preserved: content 16 rows tall, centered (rows 8..24)
    assert out[:8].max() == 0 and out[24:].max() == 0
    assert out[8:24].max() > 0


def test_unpad_slices_inverse_of_pad():
    # 10x20 image into a 2x2 grid of 16 -> feature grid 32x32 scaled;
    # unpad must crop back to the image's aspect (height padded)
    rs, cs = anyres.unpad_slices((32, 32), (10, 20))
    assert (cs.start, cs.stop) == (0, 32)
    assert rs.stop - rs.start == 16          # 32 * (10/20)
    assert rs.start == 8                      # centered


def test_pack_grid_features_newline_and_shape():
    gh, gw, ppt, d = 2, 2, 3, 5
    feats = RNG.standard_normal((gh * gw, ppt * ppt, d)).astype(np.float32)
    nl = np.full((d,), 7.0, np.float32)
    # square original: no unpadding
    out = np.asarray(anyres.pack_grid_features(feats, (gh, gw), ppt,
                                               (100, 100), nl))
    h, w = gh * ppt, gw * ppt
    assert out.shape == (h * (w + 1), d)
    # every (w+1)-th token is the newline
    rows = out.reshape(h, w + 1, d)
    np.testing.assert_array_equal(rows[:, -1], np.tile(nl, (h, 1)))
    # spatial layout: row 0 of the grid = tiles 0..gw-1's first rows
    np.testing.assert_allclose(rows[0, :ppt], feats[0].reshape(ppt, ppt, d)[0])
    np.testing.assert_allclose(rows[0, ppt:2 * ppt],
                               feats[1].reshape(ppt, ppt, d)[0])


def test_anyres_single_tile_equivalence():
    """An image already exactly tile-sized with a 1x1 pinpoint: the
    grid features must equal the base-image features (same pixels
    through the same tower), differing only by the newline tokens."""
    from qdm_tpu.api.multimodal import LlavaNextModel

    m = LlavaNextModel.from_config(seed=3)
    t = m.vision_config.image_size
    m.image_grid_pinpoints = [(t, t)]
    img = RNG.standard_normal((t, t, 3)).astype(np.float32)
    emb = np.asarray(m.encode_image_anyres(img))[0]
    ppt = t // m.vision_config.patch_size
    n_base = ppt * ppt
    base, grid = emb[:n_base], emb[n_base:]
    assert grid.shape[0] == ppt * (ppt + 1)
    rows = grid.reshape(ppt, ppt + 1, -1)
    np.testing.assert_allclose(rows[:, :-1].reshape(n_base, -1), base,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        rows[:, -1], np.tile(np.asarray(m.image_newline), (ppt, 1)),
        rtol=1e-5, atol=1e-6)


def test_anyres_multi_tile_forward_and_generate():
    from qdm_tpu.api.multimodal import LlavaNextModel

    m = LlavaNextModel.from_config(seed=4)
    t = m.vision_config.image_size
    img = RNG.standard_normal((2 * t - 3, t + 5, 3)).astype(np.float32)
    ids = RNG.integers(0, 256, (2, 4))
    out = np.asarray(m.logits(ids, image=img))
    ppt = t // m.vision_config.patch_size
    assert out.shape[0] == 2 and out.shape[1] > 4 + ppt * ppt
    assert np.isfinite(out).all()
    toks = m.generate(ids, image=img, max_new_tokens=3)
    assert np.asarray(toks).shape == (2, 3)


def test_anyres_quantized_lifecycle():
    from qdm_tpu.api.multimodal import LlavaNextModel

    m = LlavaNextModel.from_config(seed=5)
    ids = RNG.integers(0, 256, (1, 4))
    m.quantize(quant_config={"w_bit": 8, "a_bit": 16, "version": "fake"},
               quantType="rtn", quantVision=True,
               calib_data=RNG.integers(0, 256, (2, 8)))
    t = m.vision_config.image_size
    img = RNG.standard_normal((t + 7, 2 * t, 3)).astype(np.float32)
    out = np.asarray(m.logits(ids, image=img))
    assert np.isfinite(out).all()


# ------------------------------------------------------------- CIDEr-D

def test_cider_identity_and_disjoint():
    """With disjoint single references, a candidate equal to its
    reference scores exactly 10 (cos sim 1, zero length penalty) and a
    candidate sharing no n-gram scores 0."""
    refs = [["a red cat sat here"], ["blue dogs run far away"]]
    out = cider_d(["a red cat sat here", "purple trains"], refs)
    assert math.isclose(out["scores"][0], 10.0, rel_tol=1e-9)
    assert out["scores"][1] == 0.0


def test_cider_hand_computed_unigram_overlap():
    """Hand-derived fixture, max_n=1.  Corpus: 2 images, refs
    'a b' and 'c d' (df=1 for each unigram, idf=log 2).  Candidate 1
    = 'a x': corpus-unseen 'x' has df 0 -> max(df,1)=1 -> idf=log 2
    too (original-implementation convention: unseen grams keep full
    idf and enter the candidate norm).  cand vec {a: idf, x: idf},
    ref vec {a: idf, b: idf}: cos = idf^2 / (idf sqrt2 * idf sqrt2)
    = 1/2, length penalty exp(0) -> score = 5."""
    refs = [["a b"], ["c d"]]
    out = cider_d(["a x", "c q"], refs, max_n=1)
    assert math.isclose(out["scores"][0], 5.0, rel_tol=1e-9)
    assert math.isclose(out["scores"][1], 5.0, rel_tol=1e-9)


def test_cider_length_penalty():
    """Same n-gram content, longer candidate: gaussian penalty
    exp(-delta^2/72) applies on top of the cosine."""
    refs = [["a b"], ["c d"]]
    long_cand = "a b " + "x " * 6          # len 8, delta 6
    out = cider_d([long_cand.strip()], [refs[0]] + [])
    # recompute against the 2-image corpus for idf
    out = cider_d([long_cand.strip(), "c d"], refs, max_n=1)
    # cand vec: {a: idf, b: idf, x: 0 (df 0 -> idf log2 *count... x
    # unseen: df 0 -> max(df,1)=1 -> idf=log2)}  — unseen grams get
    # idf log(N), so they DO enter the candidate norm (standard
    # CIDEr behavior); numerator only over shared grams
    idf = math.log(2)
    cnorm = math.sqrt(idf ** 2 * (1 + 1 + 36))   # 'x' count 6 -> (6*idf)^2
    rnorm = math.sqrt(2) * idf
    cos = 2 * idf * idf / (cnorm * rnorm)
    pen = math.exp(-36 / 72)
    assert math.isclose(out["scores"][0], 10 * pen * cos, rel_tol=1e-9)


def test_cider_multi_reference_average():
    refs = [["a b", "z z"], ["c d"]]
    out = cider_d(["a b", "c d"], refs, max_n=1)
    # image 1: sim 1 vs ref1... ref 'z z' shares nothing -> 0;
    # averaged over the 2 refs -> 5.  (idf: 'a','b','z' df=1; len
    # penalty vs 'z z' is exp(0) but numerator 0.)
    assert math.isclose(out["scores"][0], 5.0, rel_tol=1e-6)


# ---------------------------------------------------------------- VQA

def test_vqa_normalize():
    assert normalize_answer("The Cat!") == "cat"
    assert normalize_answer("two") == "2"
    assert normalize_answer("dont") == "don't"
    assert normalize_answer("a red car") == "red car"


def test_vqa_accuracy_formula():
    # 10 humans: 4 say 'cat', 6 say 'dog'
    gts = [["cat"] * 4 + ["dog"] * 6]
    out = vqa_accuracy(["cat"], gts)
    # leave-one-out: leaving out a 'cat' -> 3 matches -> 1.0 (x4);
    # leaving out a 'dog' -> 4 matches -> 1.0 (x6) -> 1.0
    assert math.isclose(out["accuracy"], 1.0)
    out2 = vqa_accuracy(["dog"], gts)
    assert math.isclose(out2["accuracy"], 1.0)
    # 2 say 'cat': leave-out-cat -> 1/3 (x2), leave-out-other -> 2/3 (x8)
    gts3 = [["cat"] * 2 + ["dog"] * 8]
    out3 = vqa_accuracy(["cat"], gts3)
    assert math.isclose(out3["accuracy"], (2 * (1 / 3) + 8 * (2 / 3)) / 10)
    # normalization applies to both sides
    out4 = vqa_accuracy(["The cat."], [["cat"] * 10])
    assert math.isclose(out4["accuracy"], 1.0)
