"""Proposal-list format round-trip tests (format of /root/reference/ops/io.py)."""

import os

import numpy as np

from action_detection_tpu.data.proposal_io import (
    load_proposal_file, process_proposal_list,
)


def write_fixture(path, groups):
    """groups: [(vid, duration, fps, gt_rows, prop_rows)]"""
    with open(path, "w") as f:
        for i, (vid, duration, fps, gt, pr) in enumerate(groups):
            f.write(f"# {i}\n{vid}\n{duration}\n{fps}\n")
            f.write(f"{len(gt)}\n")
            for row in gt:
                f.write(" ".join(str(x) for x in row) + "\n")
            f.write(f"{len(pr)}\n")
            for row in pr:
                f.write(" ".join(str(x) for x in row) + "\n")


def test_load_proposal_file(tmp_path):
    p = tmp_path / "props.txt"
    groups = [
        ("video_a", 300, 1, [[2, 10, 50]], [[2, 0.8, 0.9, 8, 52], [0, 0.0, 0.1, 100, 200]]),
        ("video_b", 120.5, 2, [], []),
    ]
    write_fixture(p, groups)
    parsed = load_proposal_file(str(p))
    assert len(parsed) == 2
    vid, n_frame, gt, pr = parsed[0]
    assert vid == "video_a"
    assert n_frame == 300
    assert gt == [["2", "10", "50"]]
    assert pr[0] == ["2", "0.8", "0.9", "8", "52"]
    assert parsed[1][1] == int(120.5 * 2)
    assert parsed[1][2] == [] and parsed[1][3] == []


def test_process_proposal_list_roundtrip(tmp_path):
    norm = tmp_path / "norm.txt"
    out = tmp_path / "out.txt"
    groups = [
        ("vid1", 1.0, 1, [[3, 0.1, 0.5]], [[3, 0.75, 0.8, 0.05, 0.55]]),
    ]
    write_fixture(norm, groups)
    frame_dict = {"vid1": ("/frames/vid1", 200, 200)}
    process_proposal_list(str(norm), str(out), frame_dict)

    parsed = load_proposal_file(str(out))
    assert len(parsed) == 1
    vid, n_frame, gt, pr = parsed[0]
    assert vid == "/frames/vid1"
    assert n_frame == 200
    assert [int(x) for x in gt[0]] == [3, 20, 100]
    assert int(pr[0][3]) == 10 and int(pr[0][4]) == 110
    assert abs(float(pr[0][1]) - 0.75) < 1e-6
