"""Benchmark annotation loaders (C12 parity: src/vllm_inference/data/data_loader.py).

Each loader returns a list of dicts. TG datasets: {video, duration, timestamp,
sentence, qid[, video_start, video_end, pred]}. MCQ datasets: {video, question,
options, answer (0-based), duration, qid[, video_start, video_end]}.

qid formats are kept IDENTICAL to the reference so sharded jsonl outputs and
the resume-by-qid mechanism interoperate (evaluate.py:175-183).
"""

from __future__ import annotations

import json
import os
from typing import List

DATA_ROOT = os.environ.get("TIMER1_DATA_ROOT", "./dataset")


def load_activitynet(split: str = "test") -> List[dict]:
    """data_loader.py:8-35: {root}/activitynet annotations; one row per
    (video, timestamp) pair; qid = activitynet_{i}."""
    data_root = f"{DATA_ROOT}/activitynet"
    data_path = f"{data_root}/annotations/sentence_temporal_grounding/{split}.json"
    data = json.load(open(data_path))
    qid, out = 0, []
    for video_id, meta in data.items():
        video_path = None
        for ext in ("mp4", "mkv", "webm"):
            tmp = os.path.join(f"{data_root}/videos", f"{video_id}.{ext}")
            if os.path.exists(tmp):
                video_path = tmp
                break
        assert video_path is not None, video_id
        for i in range(len(meta["timestamps"])):
            out.append(
                {
                    "video": video_path,
                    "duration": meta["duration"],
                    "timestamp": meta["timestamps"][i],
                    "sentence": meta["sentences"][i].strip(),
                    "qid": f"activitynet_{qid}",
                }
            )
            qid += 1
    return out


def load_charades(split: str = "test") -> List[dict]:
    """data_loader.py:38-81 incl. the one-time txt+csv → json conversion cache."""
    data_root = f"{DATA_ROOT}/charades"
    data_path = f"{data_root}/Charades_anno/Charades_sta_{split}.json"
    if not os.path.exists(data_path):
        import pandas as pd

        data: dict = {}
        txt_path = f"{data_root}/Charades_anno/Charades_sta_{split}.txt"
        csv_path = f"{data_root}/Charades_anno/Charades_v1_{split}.csv"
        df = pd.read_csv(csv_path)
        video_to_duration = dict(zip(df["id"], df["length"]))
        for line in open(txt_path):
            if line.strip() == "":
                continue
            meta, sentence = line.split("##")
            video_id, start, end = meta.split(" ")
            if video_id not in data:
                data[video_id] = {
                    "duration": video_to_duration[video_id],
                    "timestamps": [],
                    "sentences": [],
                }
            data[video_id]["timestamps"].append([float(start), float(end)])
            data[video_id]["sentences"].append(sentence)
        with open(data_path, "w") as f:
            json.dump(data, f)
    else:
        data = json.load(open(data_path))

    qid, out = 0, []
    for video_id, meta in data.items():
        video_path = os.path.join(f"{data_root}/Charades_v1", f"{video_id}.mp4")
        for i in range(len(meta["timestamps"])):
            out.append(
                {
                    "video": video_path,
                    "duration": meta["duration"],
                    "timestamp": meta["timestamps"][i],
                    "sentence": meta["sentences"][i].strip(),
                    "qid": f"charades_{qid}",
                }
            )
            qid += 1
    return out


def load_tvgbench_filter(split: str) -> List[dict]:
    """data_loader.py:84-112: `split` is an explicit json path; rows keep
    their own qid + pred + video_start/end (the SF self-eval format)."""
    with open(split, "r", encoding="utf-8") as f:
        data = json.load(f)
    out = []
    for m in data:
        out.append(
            {
                "video": m["video"],
                "duration": m["duration"],
                "timestamp": m["timestamp"],
                "pred": m.get("pred"),
                "sentence": m["sentence"],
                "qid": m["qid"],
                "video_start": m.get("video_start"),
                "video_end": m.get("video_end"),
            }
        )
    return out


def load_tvgbench(split: str = "default") -> List[dict]:
    """data_loader.py:115-178: the in-repo 800-item benchmark; answer is an
    "s-e" string; qid = {source_stem}_{i}; rows with missing videos skipped."""
    data_path = f"{DATA_ROOT}/timer1/annotations/tvgbench.json"
    with open(data_path, "r") as f:
        raw = json.load(f)
    qid_counter, out = 0, []
    source_prefix = "None"
    for item in raw:
        video_path = item["path"]
        if not os.path.exists(video_path):
            continue
        parts = item["answer"].split("-")
        timestamp = [float(parts[0]), float(parts[1])]
        if "source" in item and isinstance(item["source"], str):
            source_filename = os.path.basename(item["source"])
            source_prefix = (
                os.path.splitext(source_filename)[0].replace(".", "_").replace("-", "_")
            )
        out.append(
            {
                "video": video_path,
                "duration": item["duration"],
                "timestamp": timestamp,
                "sentence": item["question"],
                "qid": f"{source_prefix}_{qid_counter}",
                "start": item.get("start"),
                "end": item.get("end"),
            }
        )
        qid_counter += 1
    return out


def _iter_parquet(data_dir: str):
    import pandas as pd

    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    for f in files:
        df = pd.read_parquet(f)
        for _, row in df.iterrows():
            yield row


def load_videomme(split: str = "default") -> List[dict]:
    """data_loader.py:181-206: parquet rows; split filters by duration class."""
    if split in ("test", "train"):
        split = "default"
    assert split in ("short", "medium", "long", "default")
    data_root = f"{DATA_ROOT}/videomme"
    out = []
    for itm in _iter_parquet(f"{data_root}/videomme"):
        if split == "default" or itm["duration"] == split:
            out.append(
                {
                    "video": os.path.join(f"{data_root}/data", itm["videoID"] + ".mp4"),
                    "question": itm["question"],
                    "options": [op[2:].strip() for op in itm["options"]],
                    "answer": ord(itm["answer"]) - ord("A"),
                    "duration": None,
                    "qid": f'videomme_{itm["question_id"]}',
                }
            )
    return out


def load_egoschema(split: str = "default") -> List[dict]:
    """data_loader.py:209-236."""
    if split in ("test", "train"):
        split = "default"
    assert split in ("default", "subset")
    data_root = f"{DATA_ROOT}/egoschema"
    data_path = f"{data_root}/Subset" if split == "subset" else f"{data_root}/MC"
    out = []
    for itm in _iter_parquet(data_path):
        out.append(
            {
                "video": os.path.join(f"{data_root}/videos", itm["video_idx"] + ".mp4"),
                "question": itm["question"],
                "options": [op[2:].strip() for op in itm["option"]],
                "answer": itm["answer"],
                "duration": None,
                "qid": f'egoschema_{itm["question_idx"]}',
            }
        )
    return out


def load_tempcompass(split: str = "default") -> List[dict]:
    """data_loader.py:239-283: 4 sub-splits with per-split option parsing."""
    if split in ("test", "train", "default"):
        split = "multi-choice"
    assert split in ("multi-choice", "captioning", "caption_matching", "yes_no")
    data_root = f"{DATA_ROOT}/tempcompass"
    data_path = f"{data_root}/questions/{split}.json"
    out = []
    for key, value in json.load(open(data_path)).items():
        video_path = os.path.join(f"{data_root}/videos", key + ".mp4")
        for dim in value.keys():
            for idx, itm in enumerate(value[dim]):
                question, options, answer = itm["question"], [], itm["answer"]
                if split == "yes_no":
                    options = ["yes", "no"]
                    answer = options.index(answer)
                if split == "caption_matching":
                    tmp = question.split("\n")
                    question = tmp[0]
                    answer = ":".join(answer.split(":")[1:]).strip()
                    options = [":".join(t.split(":")[1:]).strip() for t in tmp[1:]]
                    answer = options.index(answer)
                if split == "multi-choice":
                    tmp = question.split("\n")
                    question, answer = tmp[0], ord(answer[0]) - ord("A")
                    options = [t[2:].strip() for t in tmp[1:]]
                out.append(
                    {
                        "video": video_path,
                        "question": question,
                        "options": options,
                        "answer": answer,
                        "duration": None,
                        "qid": f"tempcompass|{split}|{key}|{dim}|{idx}",
                    }
                )
    return out


MVBENCH_VIDEO_DIRS = {
    "action_sequence": "video/star/Charades_v1_480/",
    "action_prediction": "video/star/Charades_v1_480/",
    "action_antonym": "video/ssv2_video/",
    "fine_grained_action": "video/Moments_in_Time_Raw/videos/",
    "unexpected_action": "video/FunQA_test/test/",
    "object_existence": "video/clevrer/video_validation/",
    "object_interaction": "video/star/Charades_v1_480/",
    "object_shuffle": "video/perception/videos/",
    "moving_direction": "video/clevrer/video_validation/",
    "action_localization": "video/sta/sta_video/",
    "scene_transition": "video/scene_qa/video/",
    "action_count": "video/perception/videos/",
    "moving_count": "video/clevrer/video_validation/",
    "moving_attribute": "video/clevrer/video_validation/",
    "state_change": "video/perception/videos/",
    "fine_grained_pose": "video/nturgbd/",
    "character_order": "video/perception/videos/",
    "egocentric_navigation": "video/vlnqa/",
    "episodic_reasoning": "video/tvqa/output_videos/",
    "counterfactual_inference": "video/clevrer/video_validation/",
}


def load_mvbench(split: str = "default") -> List[dict]:
    """data_loader.py:286-349: 20 sub-tasks; items with start+end use
    pre-split clips named {stem}_{start}_{end}.mp4 under split/."""
    data_root = f"{DATA_ROOT}/mvbench"
    data_path = f"{data_root}/json"
    out = []
    for file_name in sorted(os.listdir(data_path)):
        data_type = file_name.split(".")[0]
        video_dir = os.path.join(data_root, MVBENCH_VIDEO_DIRS[data_type])
        data = json.load(open(os.path.join(data_path, file_name)))
        for qid, itm in enumerate(data):
            row = {
                "video": os.path.join(video_dir, itm["video"]),
                "question": itm["question"],
                "options": itm["candidates"],
                "answer": itm["candidates"].index(itm["answer"]),
                "duration": None,
                "qid": f"mvbench|{data_type}|{qid}",
            }
            if "start" in itm and "end" in itm:
                clip = (
                    itm["video"].split(".mp4")[0]
                    + "_"
                    + str(itm["start"]).replace(".", "-")
                    + "_"
                    + str(itm["end"]).replace(".", "-")
                    + ".mp4"
                )
                row["video"] = os.path.join(video_dir, "split", clip)
            else:
                if "start" in itm:
                    row["video_start"] = itm["start"]
                if "end" in itm:
                    row["video_end"] = itm["end"]
            out.append(row)
    return out


LOADERS = {
    "charades": load_charades,
    "activitynet": load_activitynet,
    "tvgbench": load_tvgbench,
    "tvgbench_filter": load_tvgbench_filter,
    "videomme": load_videomme,
    "mvbench": load_mvbench,
    "egoschema": load_egoschema,
    "tempcompass": load_tempcompass,
}

TG_DATASET_NAMES = ("charades", "activitynet", "tvgbench", "tvgbench_filter")
MCQ_DATASET_NAMES = ("videomme", "mvbench", "egoschema", "tempcompass")


def load_datasets(dataset_names, split: str) -> List[dict]:
    """_load_data parity (data/__init__.py:168-202): concatenates in order."""
    if isinstance(dataset_names, str):
        dataset_names = [dataset_names]
    data: List[dict] = []
    for name in dataset_names:
        data += LOADERS[name](split=split)
    return data


def split_data(data: List[dict], curr_idx: int, total_idx: int) -> List[dict]:
    """Contiguous shard by index (data/__init__.py:204-211)."""
    data_len = (len(data) + total_idx - 1) // total_idx
    st = curr_idx * data_len
    ed = min(len(data), st + data_len)
    return data[st:ed]
