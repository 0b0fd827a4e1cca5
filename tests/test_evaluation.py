"""Evaluation harness tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdm_tpu.evaluation import (
    kl_and_topk, eval_kl_divergence, evaluate_perplexity, bin_conf,
    mse, psnr, ssim, lpips_distance, random_lpips_weights)
from qdm_tpu.evaluation.eval_utils import word_error_rate, eval_mmlu
from qdm_tpu.evaluation.humaneval import (
    check_correctness, estimate_pass_at_k, eval_humaneval)

RNG = np.random.default_rng(0)


def test_kl_identical_models_zero():
    logits = jnp.asarray(RNG.standard_normal((2, 5, 17)), jnp.float32)
    kl, t1, t5, t10 = kl_and_topk(logits, logits)
    np.testing.assert_allclose(np.asarray(kl), 0, atol=1e-5)
    assert float(t1.mean()) == 1.0 and float(t5.mean()) == 1.0


def test_kl_harness_aggregates():
    a = lambda ids: jnp.asarray(RNG.standard_normal((1, 4, 11)), jnp.float32)
    b = lambda ids: jnp.asarray(RNG.standard_normal((1, 4, 11)), jnp.float32)
    out = eval_kl_divergence(a, b, [np.zeros((1, 4), np.int32)] * 3)
    assert out["kl_mean"] > 0 and out["n_tokens"] == 12
    assert 0 <= out["top1_agreement"] <= 1
    assert bin_conf(0.5, 100) > 0


def test_perplexity_uniform_model():
    V = 32
    logits_fn = lambda ids: jnp.zeros((*np.asarray(ids).shape, V), jnp.float32)
    ppl = evaluate_perplexity(logits_fn, np.zeros(64, np.int32), seqlen=16)
    np.testing.assert_allclose(ppl, V, rtol=1e-4)


def test_image_metrics():
    a = jnp.asarray(RNG.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    assert float(mse(a, a).max()) == 0
    assert float(psnr(a, a).min()) > 100
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)
    w = random_lpips_weights()
    d_same = lpips_distance(a, a, w)
    b = jnp.clip(a + 0.5, 0, 1)
    d_diff = lpips_distance(a, b, w)
    assert float(d_same.max()) < 1e-6
    assert float(d_diff.min()) > 0


def test_wer():
    assert word_error_rate(["the cat sat"], ["the cat sat"]) == 0
    assert word_error_rate(["the cat sat"], ["the dog sat"]) == 1 / 3


def test_humaneval_sandbox():
    problem = {
        "task_id": "t/0",
        "prompt": "def add(a, b):\n",
        "test": "def check(f):\n    assert f(1, 2) == 3\n",
        "entry_point": "add",
    }
    good = check_correctness(problem, "    return a + b\n")
    bad = check_correctness(problem, "    return a - b\n")
    assert good["passed"] and not bad["passed"]
    out = eval_humaneval(lambda p: ["    return a + b\n", "    return 0\n"],
                         [problem], ks=(1, 2))
    assert out["pass@2"] == 1.0


def test_pass_at_k_estimator():
    # 1 correct of 4 samples: pass@1 = 0.25, pass@4 = 1.0
    np.testing.assert_allclose(estimate_pass_at_k([4], [1], 1), [0.25])
    np.testing.assert_allclose(estimate_pass_at_k([4], [1], 4), [1.0])


def test_mmlu_scoring():
    from qdm_tpu.utils.tokenizer import SimpleTokenizer
    from qdm_tpu.api.causal_lm import CausalLM

    tok = SimpleTokenizer(vocab_size=256, max_len=64)
    lm = CausalLM.from_config(dtype=jnp.float32)
    items = [{"question": "2+2?", "choices": ["3", "4", "5", "6"], "answer": 1}]
    out = eval_mmlu(lm.logits, tok, items)
    assert out["n"] == 1 and out["accuracy"] in (0.0, 1.0)


def test_vl_preprocess():
    from qdm_tpu.utils.vl_preprocess import smart_resize, fetch_image, smart_nframes

    h, w = smart_resize(480, 640)
    assert h % 28 == 0 and w % 28 == 0
    assert abs((h / w) - (480 / 640)) < 0.1
    img = fetch_image(RNG.uniform(0, 1, (60, 80, 3)).astype(np.float32))
    assert img.ndim == 3 and img.shape[2] == 3 and img.max() <= 1.0
    assert smart_nframes(100, video_fps=25.0) == 8


def test_module_utils():
    from qdm_tpu.utils.module import (
        get_named_linears, get_op_by_name, exclude_layers_to_not_quantize)

    params = {"a": {"q_proj": {"kernel": jnp.zeros((4, 4))},
                    "conv": {"kernel": jnp.zeros((3, 3, 4, 4))}}}
    lins = get_named_linears(params)
    assert list(lins) == ["a/q_proj"]
    assert get_op_by_name(params, "a/q_proj")["kernel"].shape == (4, 4)
    assert exclude_layers_to_not_quantize(lins, ["q_proj"]) == {}


def test_diagnostics():
    from qdm_tpu.utils.diagnostics import (
        weight_histograms, quantization_error_report)
    from qdm_tpu.quant.apply import fake_quantize_params
    from qdm_tpu.quant.plan import QuantPlan, LayerQuantSpec

    params = {"fc": {"kernel": jnp.asarray(RNG.standard_normal((32, 16)), jnp.float32)}}
    hists = weight_histograms(params)
    assert "fc" in hists and sum(hists["fc"]["hist"]) == 32 * 16
    qp = fake_quantize_params(params, QuantPlan(default=LayerQuantSpec(
        mode="fake", w_bits=4, group_size=0, weight_quant="per_channel")))
    rep = quantization_error_report(params, qp)
    assert rep["fc"]["frobenius"] > 0 and rep["fc"]["rel_error"] < 0.2


def test_pipeline_eval_harness():
    from qdm_tpu.api import StableDiffusion1_x
    from qdm_tpu.evaluation.pipeline_eval import eval_quantized_pipeline

    p1 = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    import copy
    p2 = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    p2.quantize({"w_bit": 8, "q_group_size": 0, "weight_quant_type": "per_channel",
                 "version": "fake"}, quantType="rtn")
    out = eval_quantized_pipeline(p1, p2, ["a cat", "a dog"],
                                  num_inference_steps=2, seed=0,
                                  height=64, width=64)
    assert out["n_images"] == 2
    assert out["mse"] < 0.05          # W8 barely changes images
    assert out["ssim"] > 0.8


def test_fetch_video_frame_list_and_array(tmp_path):
    """Codec-free fetch_video parity (qwen_vl_utils.py:257-301):
    frame lists pad to FRAME_FACTOR and pre-decoded arrays subsample
    via smart_nframes + budgeted smart_resize."""
    from qdm_tpu.utils.vl_preprocess import fetch_video, process_vision_info

    frames = [RNG.uniform(0, 1, (56, 84, 3)).astype(np.float32)
              for _ in range(3)]
    out = fetch_video({"video": frames})
    assert out.shape[0] == 4                   # padded to FRAME_FACTOR
    np.testing.assert_array_equal(out[2], out[3])  # last frame repeated
    assert out.shape[1] % 28 == 0 and out.shape[2] % 28 == 0

    clip = RNG.uniform(0, 1, (50, 56, 84, 3)).astype(np.float32)
    out2 = fetch_video({"video": clip, "video_fps": 25.0})
    assert out2.shape[0] == 4                  # 50/25*2 fps -> 4 frames
    assert out2.shape[3] == 3 and out2.max() <= 1.0

    # directory of frames
    from PIL import Image
    d = tmp_path / "vid"
    d.mkdir()
    for i in range(4):
        Image.fromarray((frames[0] * 255).astype(np.uint8)).save(
            d / f"f{i:03d}.png")
    out3 = fetch_video({"video": str(d)})
    assert out3.shape[0] == 4

    # conversation plumbing
    conv = [{"role": "user", "content": [
        {"type": "video", "video": frames},
        {"type": "image", "image": frames[0]}]}]
    images, videos = process_vision_info(conv)
    assert len(images) == 1 and len(videos) == 1

    with pytest.raises(NotImplementedError):
        fetch_video({"video": "clip.mp4"})


def test_mmlu_fewshot_protocol():
    """5-shot hendrycks-style formatting + subject aggregation (the
    lm_eval protocol the reference shells out to, eval_utils.py:117-164)."""
    from qdm_tpu.evaluation.eval_utils import eval_mmlu, format_mmlu_prompt
    from qdm_tpu.utils.tokenizer import SimpleTokenizer
    from qdm_tpu.api.causal_lm import CausalLM

    shot = {"question": "1+1?", "choices": ["1", "2", "3", "4"],
            "answer": 1}
    item = {"question": "2+2?", "choices": ["3", "4", "5", "6"],
            "answer": 1, "subject": "abstract_algebra"}
    p = format_mmlu_prompt(item, fewshot=[shot], subject=item["subject"])
    assert "abstract algebra" in p
    assert "Answer: B\n\n" in p          # the exemplar is answered
    assert p.rstrip().endswith("Answer:")

    tok = SimpleTokenizer(vocab_size=256, max_len=128)
    lm = CausalLM.from_config(dtype=jnp.float32)
    out = eval_mmlu(lm.logits, tok, [item, dict(item, subject="law")],
                    fewshot=[shot], n_shot=1)
    assert out["n"] == 2 and set(out["subjects"]) == {"abstract_algebra",
                                                      "law"}


def test_mmlu_categories_and_batching():
    """lm_eval make_table parity: subject-matched dev-split exemplars,
    category groups, and batched scoring == item-at-a-time scoring."""
    from qdm_tpu.evaluation.eval_utils import (
        eval_mmlu, make_mmlu_table, MMLU_CATEGORIES)
    from qdm_tpu.utils.tokenizer import SimpleTokenizer
    from qdm_tpu.api.causal_lm import CausalLM

    # the 57-subject grouping is a partition
    subs = [s for c in MMLU_CATEGORIES.values() for s in c]
    assert len(subs) == 57 and len(set(subs)) == 57

    tok = SimpleTokenizer(vocab_size=256, max_len=160)
    lm = CausalLM.from_config(dtype=jnp.float32)
    dev = [{"question": "1+1?", "choices": ["1", "2", "3", "4"],
            "answer": 1, "subject": "astronomy"},
           {"question": "2*3?", "choices": ["5", "6", "7", "8"],
            "answer": 1, "subject": "philosophy"}]
    items = [{"question": f"{i}+{i}?", "choices": ["3", "4", "5", "6"],
              "answer": 1, "subject": s}
             for i, s in enumerate(["astronomy", "philosophy",
                                    "astronomy", "sociology"])]
    out = eval_mmlu(lm.logits, tok, items, n_shot=1, dev_items=dev,
                    batch_size=3)
    assert set(out["categories"]) == {"stem", "humanities",
                                      "social_sciences"}
    # batching must not change scores (right padding is causal-neutral)
    out1 = eval_mmlu(lm.logits, tok, items, n_shot=1, dev_items=dev,
                     batch_size=1)
    assert out["subjects"] == out1["subjects"]
    tbl = make_mmlu_table(out)
    assert "mmlu" in tbl and " - stem" in tbl and "astronomy" in tbl
