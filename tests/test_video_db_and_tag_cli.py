"""Dataset DBs (synthetic fixtures) + the full TAG proposal-generation loop:
binary scores -> gen_bottom_up_proposals CLI -> proposal list -> SSNDataset."""

import json
import os
import pickle

import numpy as np
import pytest

from action_detection_tpu.data.video_db import ANetDB, THUMOSDB


def make_thumos_fixture(root):
    """Synthetic THUMOS-style metadata + frame dirs for 2 classes x 2 videos."""
    db_dir = root / "thumos_14"
    frames = root / "frames"
    for subset, vids in (("validation", ["video_validation_0001",
                                        "video_validation_0002"]),
                         ("test", ["video_test_0001", "video_test_0002"])):
        anno_dir = db_dir / f"temporal_annotations_{subset}"
        anno_dir.mkdir(parents=True, exist_ok=True)
        with open(db_dir / f"{subset}_durations.txt", "w") as f:
            for v in vids:
                f.write(f"{v}.mp4\n120.0\n")
        with open(db_dir / f"{subset}_avoid_videos.txt", "w") as f:
            f.write(f"{vids[0]} IgnoredClass\n")
        for cls in ("Diving", "Archery"):
            with open(anno_dir / f"{cls}_{subset}.txt", "w") as f:
                for i, v in enumerate(vids):
                    s = 10.0 + 30 * i
                    f.write(f"{v} {s:.1f} {s + 15:.1f}\n")
        for v in vids:
            vdir = frames / v
            vdir.mkdir(parents=True, exist_ok=True)
            for i in range(1, 121):  # 1 fps extraction
                (vdir / f"img_{i:05d}.jpg").touch()
    return db_dir.parent, frames


def make_anet_fixture(root):
    taxonomy = [
        {"nodeName": "Root", "parentName": None},
        {"nodeName": "Sports", "parentName": "Root"},
        {"nodeName": "Diving", "parentName": "Sports"},
        {"nodeName": "Archery", "parentName": "Sports"},
    ]
    database = {
        "v_abc00000001": {
            "duration": 100.0, "subset": "training", "url": "",
            "annotations": [{"label": "Diving", "segment": [10.0, 40.0]}],
        },
        "v_abc00000002": {
            "duration": 80.0, "subset": "validation", "url": "",
            "annotations": [{"label": "Archery", "segment": [5.0, 25.0]},
                            {"label": "Diving", "segment": [50.0, 70.0]}],
        },
    }
    path = root / "activity_net.v1-2.min.json"
    with open(path, "w") as f:
        json.dump({"version": "1.2", "taxonomy": taxonomy,
                   "database": database}, f)
    return root


def test_thumos_db(tmp_path):
    data_dir, frames = make_thumos_fixture(tmp_path)
    db = THUMOSDB.get_db(14, data_dir=str(data_dir))
    assert db.get_ordered_label_list() == ["Archery", "Diving"]
    vids = db.get_subset_videos("validation")
    assert len(vids) == 2
    v = vids[0]
    assert v.duration == 120.0
    assert all(i.num_label in (0, 1) for i in v.instances)
    n = db.try_load_file_path(str(frames))
    assert n == 4
    insts = db.get_subset_instance("test")
    assert len(insts) == 4


def test_anet_db(tmp_path):
    make_anet_fixture(tmp_path)
    db = ANetDB.get_db("1.2", data_dir=str(tmp_path))
    assert db.get_ordered_label_list() == ["Archery", "Diving"]
    train = db.get_subset_videos("training")
    val = db.get_subset_videos("validation")
    assert len(train) == 1 and len(val) == 1
    assert val[0].instances[0].num_label == 0  # Archery
    assert val[0].instances[0].time_span == (5.0, 25.0)


def test_tag_pipeline_end_to_end(tmp_path, monkeypatch):
    """Actionness scores -> TAG CLI -> written proposal list -> SSNDataset."""
    data_dir, frames = make_thumos_fixture(tmp_path)
    monkeypatch.chdir(tmp_path)

    # dense actionness: strong fg responses inside the GT spans
    # (videos are 120s at 1fps; scores every frame -> frm_duration 120)
    rng = np.random.RandomState(0)
    scores = {}
    for i, v in enumerate(["video_validation_0001", "video_validation_0002"]):
        T = 120
        mat = rng.randn(T, 1, 2).astype(np.float64) * 0.1
        s = int(10 + 30 * i)
        # weak wide bump -> low-threshold TAG boxes much wider than GT
        # (become "incomplete" training proposals: IoU<0.3, overlap_self>0)
        mat[max(s - 25, 0):s + 40, :, 1] += 1.2
        # strong bump on the GT span itself
        mat[s:s + 15, :, 1] += 6.0
        scores[v] = mat
    with open("actionness.pkl", "wb") as f:
        pickle.dump(scores, f)

    from action_detection_tpu.cli.gen_bottom_up_proposals import main as tag_main
    tag_main(["actionness.pkl", "--dataset", "thumos14",
              "--subset", "validation", "--data_dir", str(data_dir),
              "--frame_path", str(frames),
              "--write_proposals", "tag_proposal_list.txt", "--workers", "1"])

    from action_detection_tpu.data.proposal_io import load_proposal_file
    parsed = load_proposal_file("tag_proposal_list.txt")
    assert len(parsed) == 2
    vid, n_frame, gt, props = parsed[0]
    assert n_frame == 120
    assert len(gt) >= 1 and len(props) >= 1
    # proposals got GT-named labels and frame coordinates inside the video
    labels = {int(p[0]) for p in props}
    assert labels - {0}, "at least one proposal should be labeled fg"
    assert all(0 <= int(p[3]) <= 120 and 0 <= int(p[4]) <= 121 for p in props)

    # the written list trains an SSNDataset end to end (THUMOS thresholds)
    from action_detection_tpu.config import get_configs
    from action_detection_tpu.data.ssn_dataset import SSNDataset

    ds = SSNDataset("tag_proposal_list.txt", get_configs("thumos14").sampling,
                    verbose=False)
    assert len(ds.video_list) >= 1
    sample = ds.get_training_sample(0, np.random.RandomState(0))
    assert sample.frame_indices.shape == (8, 9)


def test_sliding_window_cli(tmp_path, monkeypatch):
    """gen_sliding_window_proposals: DB -> exponential windows -> list file."""
    data_dir, frames = make_thumos_fixture(tmp_path)
    monkeypatch.chdir(tmp_path)

    from action_detection_tpu.cli.gen_sliding_window_proposals import main as sw_main
    sw_main(["validation", "rgb", str(frames), "sw_list.txt",
             "--dataset", "thumos14", "--data_dir", str(data_dir),
             "--max_level", "6"])

    from action_detection_tpu.data.proposal_io import load_proposal_file
    parsed = load_proposal_file("sw_list.txt")
    assert len(parsed) == 2
    vid, n_frame, gt, props = parsed[0]
    assert n_frame == 120 and len(props) > 20
    # some windows overlap GT and are labeled fg
    assert any(int(p[0]) > 0 for p in props)
