"""Host-side CLI tools: mp4 summary export, benchmark table, metric study."""

import json
import os

import h5py
import numpy as np
import pytest


def test_summary_exporter(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from summarizer_tpu.cli.summary import main

    # frames NNNNNN.jpg (1-based), a preds h5 with a machine_summary
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(0)
    n = 12
    for i in range(1, n + 1):
        cv2.imwrite(str(frames / f"{i:06d}.jpg"), rng.randint(0, 255, (48, 64, 3), np.uint8))
    preds = tmp_path / "preds.h5"
    summary = np.zeros(n, np.float32)
    summary[3:9] = 1.0
    with h5py.File(preds, "w") as f:
        f.create_group("ds.h5").create_group("video_1").create_dataset(
            "machine_summary", data=summary
        )
    main([
        "-p", str(preds), "-f", str(frames), "-d", "ds.h5", "-v", "video_1",
        "--fps", "10", "--width", "64", "--height", "48",
    ])
    out = tmp_path / "summary_video_1.mp4"
    assert out.exists() and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


def test_benchmark_table(tmp_path, synth_h5, monkeypatch):
    from summarizer_tpu.cli import benchmark as B
    from summarizer_tpu.data.splits import make_random_splits, write_splits

    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = tmp_path / "synthetic_splits.json"
    write_splits(make_random_splits(keys, 2, 0.8, seed=0), str(sp))

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        B,
        "MODEL_CONFIGS",
        [
            ("Random", {"model": "random", "epochs": 1,
                        "extra_params": {"input_size": 64}}),
            ("Logistic Regression", {"model": "logistic", "epochs": 2,
                                     "extra_params": {"input_size": 64}}),
        ],
    )
    # --in-process: the monkeypatched MODEL_CONFIGS must be visible (the
    # default subprocess-per-config mode would re-import the real ones and
    # burn its crash-retry budget against the 64-dim fixture).
    B.main(["-s", str(sp), "--datasets", str(synth_h5), "-e", "2",
            "--in-process"])
    tables = list((tmp_path / "logs").glob("*benchmark/table.txt"))
    assert tables, "benchmark table not written"
    text = tables[0].read_text()
    assert "Logistic Regression" in text and "Correlation" in text


def test_benchmark_models_filter_matches_display_names(tmp_path, synth_h5,
                                                       monkeypatch):
    """--models selects by model key (all variants) OR exact display name,
    so a partial sweep can target e.g. SumGAN_sup without re-running the
    already-completed SumGAN rows."""
    from summarizer_tpu.cli import benchmark as B
    from summarizer_tpu.data.splits import make_random_splits, write_splits

    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = tmp_path / "synthetic_splits.json"
    write_splits(make_random_splits(keys, 1, 0.8, seed=0), str(sp))

    monkeypatch.chdir(tmp_path)
    ran = []
    monkeypatch.setattr(
        B,
        "MODEL_CONFIGS",
        [
            ("Random", {"model": "random", "epochs": 1, "extra_params": {}}),
            ("Random_sup", {"model": "random", "epochs": 1, "extra_params": {}}),
            ("Logistic Regression", {"model": "logistic", "epochs": 1,
                                     "extra_params": {}}),
        ],
    )
    monkeypatch.setattr(
        B, "benchmark_model", lambda name, args: ran.append(name) or []
    )
    common = ["-s", str(sp), "--datasets", str(synth_h5), "--in-process"]
    B.main(common + ["--models", "Random_sup"])
    assert ran == ["Random_sup"]  # display name: exactly one variant
    ran.clear()
    B.main(common + ["--models", "random"])
    assert ran == ["Random", "Random_sup"]  # model key: all variants


def test_validate_metrics_cli(synth_h5, capsys):
    from summarizer_tpu.cli.validate_metrics import main

    report = main(["-d", str(synth_h5)])
    assert abs(report["random_corr"]) < 0.2
    assert report["human_loo_corr"] > 0.3  # synthetic annotators correlate


def test_download_degrades_gracefully(tmp_path, monkeypatch, capsys):
    """Without egress the downloader must not leave partial files, must
    report per-file failures, and must point at the synthetic generator."""
    from summarizer_tpu.data import download as dl

    def boom(file_id, destination):
        with open(destination, "wb") as f:
            f.write(b"<html>quota page</html>")  # what Drive actually serves

    monkeypatch.setattr(dl, "download_file_from_google_drive", boom)
    status = dl.download_datasets(str(tmp_path))
    assert all(v.startswith("failed") for v in status.values()), status
    assert not list(tmp_path.iterdir())  # partials removed
    out = capsys.readouterr().out
    assert "--synthetic" in out


def test_download_keeps_valid_existing(tmp_path, monkeypatch):
    import h5py

    from summarizer_tpu.data import download as dl

    name = next(iter(dl.GDRIVE_FILES.values()))
    with h5py.File(tmp_path / name, "w") as f:
        f.create_group("video_1")

    def boom(file_id, destination):
        raise AssertionError("must not re-download a valid file")

    called = []

    def fail_others(file_id, destination):
        called.append(destination)
        raise OSError("no egress")

    monkeypatch.setattr(dl, "download_file_from_google_drive", fail_others)
    status = dl.download_datasets(str(tmp_path))
    assert status[name] == "exists"
    assert sum(v.startswith("failed") for v in status.values()) == 2
