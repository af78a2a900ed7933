"""TimeRFT sample-filtering loop end to end on the tiny model (SURVEY §3.5):
one driver round of train → smallest-checkpoint pick → self-eval → difficulty
merge → curriculum filter, all through the real CLIs and REAL video decode."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"


def test_sf_loop_one_round(tmp_path, monkeypatch):
    from time_r1_tpu.cli import train_sf
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.models.qwen25vl.convert import config_to_plain_dict
    from time_r1_tpu.utils.checkpoint import save_params

    # initial "base model" checkpoint in native format
    base = tmp_path / "base_model"
    base.mkdir()
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    save_params(str(base), params)
    (base / "timer1_config.json").write_text(json.dumps(config_to_plain_dict(CFG)))

    monkeypatch.setattr(
        Qwen25VLProcessor,
        "from_pretrained",
        classmethod(
            lambda cls, path, **kw: cls(
                TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
            )
        ),
    )

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
    data_path = tmp_path / "train.json"
    data_path.write_text(json.dumps(ann))

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = train_sf.get_args(
            [
                "--model_name_or_path", str(base),
                "--exp_dir", "exp",
                "--initial_data", str(data_path),
                "--rounds", "1",
                "--k", "2",
                "--num_generations", "2",
                "--max_completion_length", "4",
                "--eval_max_new_tokens", "4",
                "--total_pixels", str(8 * 28 * 28),
                "--reward_funcs", "iou_v2", "format",
            ]
        )
        train_sf.main(args)
    finally:
        os.chdir(cwd)

    round_dir = tmp_path / "exp" / "round_0"
    # train artifacts
    assert any(d.startswith("checkpoint-") for d in os.listdir(round_dir))
    # self-eval artifacts
    eval_dir = round_dir / "filtering_epoch0"
    jsonls = [f for f in os.listdir(eval_dir) if f.endswith(".jsonl")]
    assert jsonls
    recs = [json.loads(l) for l in open(eval_dir / jsonls[0])]
    assert {r["qid"] for r in recs} == {"tvg_0", "tvg_1"}
    # difficulty-merged annotations for the next round
    merged = round_dir / str(eval_dir.relative_to(tmp_path)) / "train_v4_cloud.json"
    assert merged.exists()
    data = json.load(open(merged))
    assert all("difficulty" in d and "pred" in d for d in data)


def test_sf_loop_two_rounds_handoff(tmp_path, monkeypatch):
    """The cross-round filesystem handoff (train_rl_SF.sh:15-113) — the part
    a single-round test can't see: round 1 must train FROM round 0's
    smallest checkpoint ON round 0's filtered json (difficulty fields
    propagated), and produce its own full artifact set.

    filter_task=random_sample keeps the data nonempty regardless of the tiny
    model's (all-wrong) difficulties — 0070_all's 0<p≤0.7 selection math is
    pinned separately by the curriculum golden tests."""
    from time_r1_tpu.cli import train_sf
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.models.qwen25vl.convert import config_to_plain_dict
    from time_r1_tpu.utils.checkpoint import save_params

    base = tmp_path / "base_model"
    base.mkdir()
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    save_params(str(base), params)
    (base / "timer1_config.json").write_text(json.dumps(config_to_plain_dict(CFG)))

    monkeypatch.setattr(
        Qwen25VLProcessor,
        "from_pretrained",
        classmethod(
            lambda cls, path, **kw: cls(
                TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
            )
        ),
    )

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
    data_path = tmp_path / "train.json"
    data_path.write_text(json.dumps(ann))

    # capture the data file and model each round's TRAIN actually received
    from time_r1_tpu.cli import train as train_cli

    consumed = []
    real_get_args = train_cli.get_args

    def spy_get_args(argv=None):
        args = real_get_args(argv)
        consumed.append((args.train_data_path, args.model_name_or_path))
        return args

    monkeypatch.setattr(train_cli, "get_args", spy_get_args)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = train_sf.get_args(
            [
                "--model_name_or_path", str(base),
                "--exp_dir", "exp",
                "--initial_data", str(data_path),
                "--rounds", "2",
                "--k", "2",
                "--filter_task", "random_sample",
                "--num_generations", "2",
                "--max_completion_length", "4",
                "--eval_max_new_tokens", "4",
                "--total_pixels", str(8 * 28 * 28),
                "--reward_funcs", "iou_v2", "format",
            ]
        )
        train_sf.main(args)
    finally:
        os.chdir(cwd)

    r0 = tmp_path / "exp" / "round_0"
    r1 = tmp_path / "exp" / "round_1"
    assert any(d.startswith("checkpoint-") for d in os.listdir(r1))

    # round 0 trained on the initial data from the base model
    assert consumed[0] == (str(data_path), str(base))
    # round 1 trained on round 0's FILTERED json from round 0's SMALLEST ckpt
    # (paths inside train_sf are cwd-relative; compare the checkpoint name)
    r1_data, r1_model = consumed[1]
    assert os.path.basename(r1_model) == os.path.basename(
        train_sf.smallest_checkpoint(str(r0))
    )
    assert (tmp_path / r1_model).is_dir()  # and it points into round_0
    assert r1_data.endswith("_random.json")
    data1 = json.load(open(tmp_path / r1_data))  # train_sf paths are cwd-relative
    assert len(data1) == 2  # k=2 of 2 — no silent drop on the handoff
    # difficulty + pred fields from round 0's self-eval propagated forward
    assert all("difficulty" in d and "pred" in d for d in data1)
    assert {d["qid"] for d in data1} == {"tvg_0", "tvg_1"}

    # round 1 produced its own eval + merge artifacts (epoch-suffixed dir)
    eval_dir1 = r1 / "filtering_epoch1"
    assert any(f.endswith(".jsonl") for f in os.listdir(eval_dir1))
