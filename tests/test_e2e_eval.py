"""System test: the full eval pipeline on a REAL video with the tiny model —
EvalDataset (decode+resize+patchify+template) → evaluate CLI main() → sharded
jsonl with resume → eval_all scoring. Mirrors SURVEY §3.3's call stack."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"


@pytest.fixture(scope="module")
def tiny_setup():
    import jax

    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.sampler import Engine

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    engine = Engine(params, CFG, dtype=jnp.float32)
    processor = Qwen25VLProcessor(TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id)
    return engine, processor


@pytest.fixture()
def annotations(tmp_path):
    ann = [
        {
            "video": VIDEO,
            "duration": 35.04,
            "timestamp": [1.0, 7.5],
            "sentence": "person sitting down in a chair",
            "qid": "tvg_0",
            "video_start": 0.0,
            "video_end": 3.0,
            "pred": None,
        },
        {
            "video": VIDEO,
            "duration": 35.04,
            "timestamp": [10.0, 12.0],
            "sentence": "person stands up",
            "qid": "tvg_1",
            "video_start": 4.0,
            "video_end": 7.0,
            "pred": None,
        },
    ]
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(ann))
    return str(path)


def test_eval_dataset_builds_requests(tiny_setup, annotations):
    from time_r1_tpu.data import EvalDataset

    _, processor = tiny_setup
    ds = EvalDataset(
        processor,
        datatype="tg",
        dataset_names=["tvgbench_filter"],
        split=annotations,
        min_pixels=4 * 28 * 28,
        total_pixels=8 * 28 * 28,
        use_r1_thinking_prompt=True,
    )
    items = list(ds)
    assert len(items) == 2
    req = items[0]["request"]
    n_video_tokens = sum(1 for t in req.input_ids if t == CFG.video_token_id)
    t, h, w = req.grid_thw
    assert n_video_tokens == t * h * w // 4
    assert req.patches.shape == (t * h * w, CFG.vision.patch_input_dim)
    assert items[0]["timestamps"] == [1.0, 7.5]


def test_evaluate_cli_end_to_end_with_resume(tiny_setup, annotations, tmp_path, monkeypatch):
    from time_r1_tpu.cli import evaluate as evaluate_cli
    from time_r1_tpu.cli.eval_all import score_dir

    engine, processor = tiny_setup
    out_dir = str(tmp_path / "eval_out")
    argv = [
        "--model_base", "unused",
        "--datasets", "tvgbench_filter",
        "--split", annotations,
        "--output_dir", out_dir,
        "--use_r1_thinking_prompt",
        "--max_new_tokens", "6",
        "--total_pixels", str(8 * 28 * 28),
        "--min_pixels", str(4 * 28 * 28),
    ]
    args = evaluate_cli.get_args(argv)
    assert args.datatype == "tg"
    out_file = evaluate_cli.main(args, engine=engine, processor=processor)

    recs = [json.loads(l) for l in open(out_file)]
    assert {r["qid"] for r in recs} == {"tvg_0", "tvg_1"}
    for r in recs:
        assert "output_text" in r and isinstance(r["pred"], list)

    # resume: running again must not duplicate rows
    evaluate_cli.main(args, engine=engine, processor=processor)
    recs2 = [json.loads(l) for l in open(out_file)]
    assert len(recs2) == 2

    # scoring via eval_all (tvgbench-style TG scoring)
    scores = score_dir(out_dir, "tvgbench")
    assert set(scores.keys()) == {"mIoU", 0.3, 0.5, 0.7, "avg"}


def test_evaluate_cli_emits_record_for_undecodable_video(tiny_setup, tmp_path):
    """An undecodable video must still produce a jsonl record (pred
    [None, None] → scored 0.0 with the row IN the denominator — the
    reference emits a prediction for every row via its backend fallback,
    vision_process.py:362-368) and must NOT be re-attempted on resume."""
    from time_r1_tpu.cli import evaluate as evaluate_cli
    from time_r1_tpu.utils.metrics import score_tg_records

    engine, processor = tiny_setup
    bad = tmp_path / "not_a_video.mp4"
    bad.write_bytes(b"garbage bytes, no container")
    ann = [
        {
            "video": str(bad),
            "duration": 10.0,
            "timestamp": [1.0, 2.0],
            "sentence": "broken row",
            "qid": "tvg_bad",
            "pred": None,
        },
        {
            "video": VIDEO,
            "duration": 35.04,
            "timestamp": [1.0, 7.5],
            "sentence": "person sitting down in a chair",
            "qid": "tvg_good",
            "video_start": 0.0,
            "video_end": 3.0,
            "pred": None,
        },
    ]
    split = tmp_path / "ann_bad.json"
    split.write_text(json.dumps(ann))

    out_dir = str(tmp_path / "eval_bad")
    args = evaluate_cli.get_args(
        [
            "--model_base", "unused",
            "--datasets", "tvgbench_filter",
            "--split", str(split),
            "--output_dir", out_dir,
            "--use_r1_thinking_prompt",
            "--max_new_tokens", "5",
            "--total_pixels", str(8 * 28 * 28),
            "--min_pixels", str(4 * 28 * 28),
        ]
    )
    out_file = evaluate_cli.main(args, engine=engine, processor=processor)
    recs = [json.loads(l) for l in open(out_file)]
    assert {r["qid"] for r in recs} == {"tvg_bad", "tvg_good"}
    bad_rec = next(r for r in recs if r["qid"] == "tvg_bad")
    assert bad_rec["pred"] == [None, None] and "error" in bad_rec
    # the failed row scores 0.0 but STAYS in the denominator
    scores = score_tg_records(recs)
    assert scores["tvg_bad"] == 0.0 and len(scores) == 2
    # resume: the emitted record means the row is NOT re-attempted
    evaluate_cli.main(args, engine=engine, processor=processor)
    assert len([l for l in open(out_file)]) == 2


def test_eval_dataset_parallel_decode_matches_serial(tiny_setup, annotations):
    """num_workers>1 must yield the same items in the same order as the
    serial path (threaded decode + in-flight dedup is an overlap, not a
    semantic change)."""
    from time_r1_tpu.data import EvalDataset

    _, processor = tiny_setup
    kw = dict(
        datatype="tg",
        dataset_names=["tvgbench_filter"],
        split=annotations,
        min_pixels=4 * 28 * 28,
        total_pixels=8 * 28 * 28,
        use_r1_thinking_prompt=True,
    )
    serial = list(EvalDataset(processor, num_workers=0, **kw))
    par = list(EvalDataset(processor, num_workers=4, **kw))
    assert [i["qid"] for i in par] == [i["qid"] for i in serial]
    for a, b in zip(serial, par):
        assert a["request"].input_ids == b["request"].input_ids
        assert np.allclose(np.asarray(a["request"].patches), np.asarray(b["request"].patches))


def test_evaluate_cli_continuous_batching(tiny_setup, annotations, tmp_path):
    from time_r1_tpu.cli import evaluate as evaluate_cli

    engine, processor = tiny_setup
    out_dir = str(tmp_path / "eval_cb")
    args = evaluate_cli.get_args(
        [
            "--model_base", "unused",
            "--datasets", "tvgbench_filter",
            "--split", annotations,
            "--output_dir", out_dir,
            "--use_r1_thinking_prompt",
            "--max_new_tokens", "6",
            "--total_pixels", str(8 * 28 * 28),
            "--min_pixels", str(4 * 28 * 28),
            "--use_continuous_batching",
            "--max_model_len", "1024",
            "--batch_size", "2",
        ]
    )
    out_file = evaluate_cli.main(args, engine=engine, processor=processor)
    recs = [json.loads(l) for l in open(out_file)]
    assert {r["qid"] for r in recs} == {"tvg_0", "tvg_1"}


def test_calc_difficulty_merge_flow(tiny_setup, annotations, tmp_path):
    """SF-loop steps 3-5: self-eval jsonl → difficulty merge → filter."""
    from time_r1_tpu.cli import evaluate as evaluate_cli
    from time_r1_tpu.cli.calc_difficulty import merge
    from time_r1_tpu.utils.curriculum import filter_and_sample

    engine, processor = tiny_setup
    out_dir = str(tmp_path / "filtering_epoch0")
    args = evaluate_cli.get_args(
        [
            "--model_base", "unused",
            "--datasets", "tvgbench_filter",
            "--split", annotations,
            "--output_dir", out_dir,
            "--use_r1_thinking_prompt",
            "--max_new_tokens", "6",
            "--total_pixels", str(8 * 28 * 28),
            "--min_pixels", str(4 * 28 * 28),
        ]
    )
    evaluate_cli.main(args, engine=engine, processor=processor)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        merged = merge(input_dir="filtering_epoch0", split=annotations, output_dir="out")
    finally:
        os.chdir(cwd)
    data = json.load(open(os.path.join(tmp_path, merged)))
    assert len(data) == 2
    assert all("difficulty" in d for d in data)
    # curriculum filter consumes the merged file's difficulty fields
    sampled = filter_and_sample(data, "0070_all", k=10)
    assert isinstance(sampled, list)


def test_evaluate_cli_quantized_serving_from_checkpoint(annotations, tmp_path, monkeypatch):
    """The disk path of the eval CLI with the quantized-serving flags:
    native checkpoint → load_checkpoint → Engine(quantization="int8",
    kv_cache_quant) → sharded jsonl (vLLM --quantization/--kv-cache-dtype
    capability, driven end-to-end)."""
    import jax

    from time_r1_tpu.cli import evaluate as evaluate_cli
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.models.qwen25vl.convert import config_to_plain_dict
    from time_r1_tpu.utils.checkpoint import save_params

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    save_params(str(ckpt), params)
    (ckpt / "timer1_config.json").write_text(json.dumps(config_to_plain_dict(CFG)))

    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    monkeypatch.setattr(
        Qwen25VLProcessor, "from_pretrained", classmethod(lambda cls, p: processor)
    )

    out_dir = str(tmp_path / "eval_q8")
    args = evaluate_cli.get_args(
        [
            "--model_base", str(ckpt),
            "--datasets", "tvgbench_filter",
            "--split", annotations,
            "--output_dir", out_dir,
            "--use_r1_thinking_prompt",
            "--max_new_tokens", "5",
            "--total_pixels", str(8 * 28 * 28),
            "--min_pixels", str(4 * 28 * 28),
            "--quantization", "int8",
            "--kv_cache_dtype", "int8",
        ]
    )
    out_file = evaluate_cli.main(args)
    recs = [json.loads(l) for l in open(out_file)]
    assert {r["qid"] for r in recs} == {"tvg_0", "tvg_1"}
