"""Benchmark loader tests over synthetic fixture trees: directory layouts,
qid formats and per-dataset option parsing (C12 parity, data_loader.py)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def data_root(tmp_path, monkeypatch):
    import time_r1_tpu.data.loaders as L

    monkeypatch.setattr(L, "DATA_ROOT", str(tmp_path))
    return tmp_path


def _touch(path):
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    open(path, "wb").write(b"\x00")


def test_load_charades_txt_csv_conversion(data_root):
    from time_r1_tpu.data.loaders import load_charades

    anno = data_root / "charades" / "Charades_anno"
    anno.mkdir(parents=True)
    (anno / "Charades_sta_test.txt").write_text(
        "V1 1.0 3.5##person opens a door.\nV1 4.0 6.0##person sits down.\nV2 0.5 2.0##person runs.\n"
    )
    (anno / "Charades_v1_test.csv").write_text("id,length\nV1,10.0\nV2,8.5\n")
    out = load_charades("test")
    assert [o["qid"] for o in out] == ["charades_0", "charades_1", "charades_2"]
    assert out[0]["timestamp"] == [1.0, 3.5] and out[0]["duration"] == 10.0
    assert out[2]["video"].endswith("Charades_v1/V2.mp4")
    # conversion cached as json; second load uses it
    assert (anno / "Charades_sta_test.json").exists()
    again = load_charades("test")
    assert [o["qid"] for o in again] == [o["qid"] for o in out]


def test_load_activitynet(data_root):
    from time_r1_tpu.data.loaders import load_activitynet

    ann_dir = data_root / "activitynet" / "annotations" / "sentence_temporal_grounding"
    ann_dir.mkdir(parents=True)
    _touch(data_root / "activitynet" / "videos" / "vid1.mkv")
    (ann_dir / "test.json").write_text(
        json.dumps({"vid1": {"duration": 12.0, "timestamps": [[0, 4], [5, 9]], "sentences": ["a ", "b"]}})
    )
    out = load_activitynet("test")
    assert len(out) == 2
    assert out[0]["qid"] == "activitynet_0" and out[1]["qid"] == "activitynet_1"
    assert out[0]["video"].endswith("vid1.mkv")  # extension fallback order
    assert out[0]["sentence"] == "a"


def test_load_tempcompass_splits(data_root):
    from time_r1_tpu.data.loaders import load_tempcompass

    qdir = data_root / "tempcompass" / "questions"
    qdir.mkdir(parents=True)
    (qdir / "multi-choice.json").write_text(
        json.dumps(
            {
                "vid": {
                    "order": [
                        {
                            "question": "What happens first?\nA. run\nB. sit",
                            "answer": "B. sit",
                        }
                    ]
                }
            }
        )
    )
    (qdir / "yes_no.json").write_text(
        json.dumps({"vid": {"order": [{"question": "Is it day?", "answer": "no"}]}})
    )
    mc = load_tempcompass("multi-choice")
    assert mc[0]["options"] == ["run", "sit"] and mc[0]["answer"] == 1
    assert mc[0]["qid"] == "tempcompass|multi-choice|vid|order|0"
    yn = load_tempcompass("yes_no")
    assert yn[0]["options"] == ["yes", "no"] and yn[0]["answer"] == 1


def test_load_mvbench_split_clips(data_root):
    from time_r1_tpu.data.loaders import load_mvbench

    jdir = data_root / "mvbench" / "json"
    jdir.mkdir(parents=True)
    (jdir / "action_localization.json").write_text(
        json.dumps(
            [
                {
                    "video": "clip.mp4",
                    "question": "q?",
                    "candidates": ["x", "y"],
                    "answer": "y",
                    "start": 2.5,
                    "end": 7.0,
                }
            ]
        )
    )
    (jdir / "action_count.json").write_text(
        json.dumps([{"video": "v.mp4", "question": "n?", "candidates": ["1", "2"], "answer": "1"}])
    )
    out = load_mvbench()
    by_qid = {o["qid"]: o for o in out}
    # start+end → pre-split clip path with dots replaced by dashes
    clip = by_qid["mvbench|action_localization|0"]
    assert clip["video"].endswith("sta/sta_video/split/clip_2-5_7-0.mp4")
    assert clip["answer"] == 1
    plain = by_qid["mvbench|action_count|0"]
    assert plain["video"].endswith("perception/videos/v.mp4") and plain["answer"] == 0


def test_load_videomme_parquet(data_root):
    import pandas as pd

    from time_r1_tpu.data.loaders import load_videomme

    pdir = data_root / "videomme" / "videomme"
    pdir.mkdir(parents=True)
    df = pd.DataFrame(
        [
            {
                "videoID": "abc",
                "question": "what?",
                "options": ["A. one", "B. two"],
                "answer": "B",
                "duration": "short",
                "question_id": "001-1",
            },
            {
                "videoID": "def",
                "question": "who?",
                "options": ["A. x", "B. y"],
                "answer": "A",
                "duration": "long",
                "question_id": "002-1",
            },
        ]
    )
    df.to_parquet(pdir / "test-00000.parquet")
    out = load_videomme("default")
    assert len(out) == 2
    assert out[0]["qid"] == "videomme_001-1"
    assert out[0]["options"] == ["one", "two"] and out[0]["answer"] == 1
    short = load_videomme("short")
    assert len(short) == 1 and short[0]["qid"] == "videomme_001-1"


def test_load_tvgbench_answer_parse(data_root, tmp_path):
    from time_r1_tpu.data.loaders import load_tvgbench

    video = tmp_path / "real.mp4"
    _touch(video)
    ann_dir = data_root / "timer1" / "annotations"
    ann_dir.mkdir(parents=True)
    (ann_dir / "tvgbench.json").write_text(
        json.dumps(
            [
                {
                    "path": str(video),
                    "duration": 30.0,
                    "answer": "3.5-9.25",
                    "question": "the event",
                    "start": 0,
                    "end": 30,
                    "source": "data/qv-highlights.json",
                },
                {"path": "/missing.mp4", "duration": 1, "answer": "0-1", "question": "x", "start": 0, "end": 1},
            ]
        )
    )
    out = load_tvgbench()
    assert len(out) == 1  # missing video skipped
    assert out[0]["timestamp"] == [3.5, 9.25]
    assert out[0]["qid"] == "qv_highlights_0"  # dots/dashes → underscores
