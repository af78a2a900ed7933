"""Pipeline-parallel GENERATION (parallel/pipeline.py:pp_generate): greedy
outputs must exactly match the single-device bucket engine — the vLLM
--pipeline_parallel_size serving capability, stage-sharded layers + per-stage
KV caches + ppermute relays (vllm_infer.py:42-51)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG, hf_model, jx_params  # fixtures  # noqa: F401
from time_r1_tpu.parallel.pipeline import PPEngine
from time_r1_tpu.sampler import Engine, Request, SamplingParams


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
@pytest.mark.parametrize("n_stages", [2])
def test_pp_generate_matches_bucket_greedy(jx_params, n_stages):  # noqa: F811
    rng = np.random.default_rng(0)
    reqs = [
        Request(input_ids=list(rng.integers(2, 200, int(n))))
        for n in (9, 21, 14)
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)
    want = Engine(jx_params, CFG, dtype=jnp.float32).generate(reqs, sp)
    pp = PPEngine(jx_params, CFG, n_stages=n_stages, dtype=jnp.float32)
    got = pp.generate(reqs, sp)
    assert got == want


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
def test_pp_generate_video_and_groups(jx_params):  # noqa: F811
    rng = np.random.default_rng(1)
    grid = (2, 4, 4)
    n_vis = 2 * 2 * 2
    req = Request(
        input_ids=(
            list(rng.integers(2, 200, 5))
            + [CFG.vision_start_token_id]
            + [CFG.video_token_id] * n_vis
            + [CFG.vision_end_token_id]
            + list(rng.integers(2, 200, 3))
        ),
        patches=rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
        grid_thw=grid,
        second_per_grid_t=1.0,
    )
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=2,
    )
    want = Engine(jx_params, CFG, dtype=jnp.float32).generate([req], sp)
    got = PPEngine(jx_params, CFG, n_stages=2, dtype=jnp.float32).generate([req], sp)
    assert got == want


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
def test_evaluate_cli_pipeline_parallel(jx_params, tmp_path, monkeypatch):  # noqa: F811
    """--pipeline_parallel_size 2 routes the eval CLI through PPEngine and
    produces the same records as the single-device run (no silently-ignored
    parallelism flag — VERDICT r2 #9)."""
    import json

    from test_e2e_eval import annotations as _ann_fixture  # noqa: F401
    from tiny_tokenizer import TinyTokenizer
    from time_r1_tpu.cli import evaluate as evaluate_cli
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl.convert import config_to_plain_dict
    from time_r1_tpu.utils.checkpoint import save_params

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_params(str(ckpt), jx_params)
    (ckpt / "timer1_config.json").write_text(json.dumps(config_to_plain_dict(CFG)))

    ann = tmp_path / "tvg.json"
    ann.write_text(
        json.dumps(
            [
                {
                    "video": "/root/reference/assets/OHOFG.mp4",
                    "duration": 35.04,
                    "timestamp": [1.0, 7.5],
                    "sentence": "person sitting down in a chair.",
                    "qid": "tvg_0",
                    "video_start": 0.0,
                    "video_end": 2.0,
                    "pred": [0.0, 1.0],
                }
            ]
        )
    )
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    monkeypatch.setattr(
        Qwen25VLProcessor, "from_pretrained", classmethod(lambda cls, p: processor)
    )

    outputs = {}
    for tag, extra in [("pp2", ["--pipeline_parallel_size", "2"]), ("single", [])]:
        out_dir = str(tmp_path / f"eval_{tag}")
        args = evaluate_cli.get_args(
            [
                "--model_base", str(ckpt),
                "--datasets", "tvgbench_filter",
                "--split", str(ann),
                "--output_dir", out_dir,
                "--use_r1_thinking_prompt",
                "--max_new_tokens", "5",
                "--total_pixels", str(8 * 28 * 28),
                "--min_pixels", str(4 * 28 * 28),
                *extra,
            ]
        )
        out_file = evaluate_cli.main(args)
        outputs[tag] = [json.loads(l) for l in open(out_file)]
    assert outputs["pp2"] == outputs["single"]
    assert {r["qid"] for r in outputs["pp2"]} == {"tvg_0"}


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
def test_pp_tp_compose_matches_bucket_greedy(jx_params):  # noqa: F811
    """TP×PP composition (vLLM -tp × -pp capability): 2 stages × TP 2 over a
    (stage, model) mesh — Megatron column/row-split layers inside each stage,
    o/down partial sums psum over the model axis, per-device kv-head caches.
    Greedy output must exactly match the single-device engine."""
    rng = np.random.default_rng(5)
    reqs = [Request(input_ids=list(rng.integers(2, 200, int(n)))) for n in (11, 7)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)
    want = Engine(jx_params, CFG, dtype=jnp.float32).generate(reqs, sp)
    pp = PPEngine(jx_params, CFG, n_stages=2, dtype=jnp.float32, tp=2)
    assert dict(pp.mesh.shape) == {"stage": 2, "model": 2}
    # at least one weight actually sharded across all 4 devices
    qw = pp.staged["self_attn"]["q_w"]
    assert len(qw.sharding.device_set) == 4
    got = pp.generate(reqs, sp)
    assert got == want


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
def test_pp_int8_matches_single_device_int8(jx_params):  # noqa: F811
    """PP × --quantization int8: the stage-sharded fused-int8 decode tree
    must greedy-match the single-device int8 engine exactly (same
    quantize_params tree, same per-layer math, relayed over stages)."""
    rng = np.random.default_rng(9)
    reqs = [Request(input_ids=list(rng.integers(2, 200, int(n)))) for n in (10, 6)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)
    want = Engine(jx_params, CFG, dtype=jnp.float32, quantization="int8").generate(reqs, sp)
    pp = PPEngine(jx_params, CFG, n_stages=2, dtype=jnp.float32, quantization="int8")
    got = pp.generate(reqs, sp)
    assert got == want

    with pytest.raises(ValueError, match="TP×PP with --quantization"):
        PPEngine(jx_params, CFG, n_stages=2, tp=2, quantization="int8")
