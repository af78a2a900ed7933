"""The production train CLI builds a mesh and trains SHARDED — the recipe
path (scripts/posttrain/train_rl.sh → python -m time_r1_tpu.cli.train) must
reach the FSDP/example-DP machinery with no code edits (VERDICT r2 #1;
reference launch surface: torchrun + --deepspeed, train_rl.sh:12-18)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_train_cli_runs_sharded(tmp_path, monkeypatch):
    from time_r1_tpu.cli import train as train_cli
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

    ann = tmp_path / "train.json"
    ann.write_text(
        json.dumps(
            [
                {
                    "video": VIDEO,
                    "duration": 35.04,
                    "timestamp": [1.0, 7.5],
                    "sentence": "person sitting down in a chair.",
                    "qid": "q0",
                    "video_start": 0.0,
                    "video_end": 3.0,
                }
            ]
        )
    )

    args = train_cli.get_args(
        [
            "--model_name_or_path", str(ckpt),
            "--output_dir", str(tmp_path / "out"),
            "--train_data_path", str(ann),
            "--reward_funcs", "format",
            "--num_generations", "8",  # divisible by the 8-wide data axis
            "--max_completion_length", "4",
            "--num_train_epochs", "1",
            "--gradient_accumulation_steps", "1",
            "--beta", "0.0",
            "--total_pixels", str(8 * 28 * 28),
            "--video_min_pixels", str(4 * 28 * 28),
            "--save_strategy", "epoch",
            "--gradient_checkpointing", "false",
            "--report_to", "none",
        ]
    )
    trainer = train_cli.main(args)

    # the CLI built a mesh and sharded the trainer over all 8 devices
    assert trainer.mesh is not None
    assert trainer.mesh.devices.size == 8
    qw = trainer.params["text"]["layers"]["self_attn"]["q_w"]
    assert len(qw.sharding.device_set) == 8
    assert trainer.global_step >= 1
    assert np.isfinite(np.asarray(jax.tree.leaves(trainer.params)[0]).sum())
