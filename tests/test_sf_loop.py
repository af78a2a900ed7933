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
