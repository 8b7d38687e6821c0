"""Egress-day rehearsal: the real-data path, end to end, against a local
mock of Google Drive.

The real SumMe/TVSum/LOL h5s need network egress this environment doesn't
have, so the code path that will run on egress day — download (with the
Drive confirm-token dance, summarizer/utils/io.py:15-36) -> eccv16->
summarizer schema normalization (summarizer/datasets/
normalize_datasets.py:20-61) -> one training fold — is rehearsed here
against a localhost HTTP server that mimics Drive's redirect contract.

One command runs the whole rehearsal:
    python -m pytest tests/test_egress_rehearsal.py -q
"""

from __future__ import annotations

import http.server
import threading

import h5py
import numpy as np
import pytest


# ----------------------------------------------------------- mock Drive server
class _MockDrive(http.server.BaseHTTPRequestHandler):
    """Mimics docs.google.com/uc?export=download for large files: the first
    GET returns an HTML warning page plus a ``download_warning_*`` cookie;
    only a GET that echoes the cookie value as ``confirm=`` gets bytes."""

    files: dict = {}  # file_id -> bytes (set by the fixture)
    log: list = []  # (file_id, confirmed: bool)
    TOKEN = "t0k3n"

    def do_GET(self):  # noqa: N802 (stdlib naming)
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        file_id = q.get("id", [""])[0]
        confirm = q.get("confirm", [""])[0]
        if file_id not in self.files:
            self.send_response(404)
            self.end_headers()
            return
        if confirm != self.TOKEN:
            # Warning page: HTML body, token only in the cookie.
            type(self).log.append((file_id, False))
            body = b"<html>Google Drive can't scan this file for viruses</html>"
            self.send_response(200)
            self.send_header("Set-Cookie", f"download_warning_x={self.TOKEN}; Path=/")
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)
            return
        type(self).log.append((file_id, True))
        data = self.files[file_id]
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture()
def mock_drive():
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _MockDrive)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    _MockDrive.files = {}
    _MockDrive.log = []
    yield server, f"http://127.0.0.1:{server.server_address[1]}/uc"
    server.shutdown()


# ------------------------------------------------------------ eccv16 fixtures
def _eccv16_summe_h5(path: str, n_videos: int = 6, n_users: int = 3):
    """An eccv16_dataset_summe_google_pool5.h5-shaped file: the summarizer
    schema MINUS /user_scores and /video_name (what normalization adds,
    summarizer/datasets/normalize_datasets.py:48-61)."""
    from summarizer_tpu.data.synthetic import synth_video

    rng = np.random.RandomState(7)
    with h5py.File(path, "w") as f:
        for i in range(n_videos):
            v = synth_video(rng, int(rng.randint(24, 40)), 64, n_users=n_users)
            g = f.create_group(f"video_{i + 1}")
            for k in ("features", "gtscore", "gtsummary", "user_summary",
                      "change_points", "n_frame_per_seg", "n_frames",
                      "n_steps", "picks"):
                g.create_dataset(k, data=v[k])


def test_egress_day_path_download_normalize_train(tmp_path, mock_drive, monkeypatch):
    server, url = mock_drive

    # --- stage the upstream file behind the mocked Drive ---
    eccv = str(tmp_path / "upstream.h5")
    _eccv16_summe_h5(eccv)
    payload = open(eccv, "rb").read()
    _MockDrive.files["fake-summe-id"] = payload

    from summarizer_tpu.data import download as dl

    monkeypatch.setattr(dl, "_URL", url)
    monkeypatch.setattr(
        dl, "GDRIVE_FILES", {"fake-summe-id": "eccv16_dataset_summe_google_pool5.h5"}
    )

    # --- 1. download: must perform the confirm-token dance ---
    dest_dir = str(tmp_path / "datasets")
    status = dl.download_datasets(dest_dir=dest_dir)
    assert status["eccv16_dataset_summe_google_pool5.h5"] == "ok"
    assert _MockDrive.log == [("fake-summe-id", False), ("fake-summe-id", True)], (
        "expected warning-page GET then confirmed GET, got " + repr(_MockDrive.log)
    )
    got = str(tmp_path / "datasets" / "eccv16_dataset_summe_google_pool5.h5")
    assert open(got, "rb").read() == payload

    # --- 2. normalize: eccv16 schema -> summarizer schema ---
    out_h5 = str(tmp_path / "datasets" / "summarizer_dataset_summe_google_pool5.h5")
    from summarizer_tpu.cli.normalize import main as normalize_main

    normalize_main(["summe", "--eccv-h5", got, "--out-h5", out_h5])
    with h5py.File(out_h5) as f:
        for key in f:
            us = f[key]["user_scores"][...]
            n_frames = int(np.asarray(f[key]["n_frames"][()]).reshape(-1)[0])
            assert us.shape == (1, n_frames)  # 1 pseudo-user (ref :48-61)

    # --- 3. one training fold on the normalized file ---
    from summarizer_tpu.data.splits import write_splits
    from summarizer_tpu.train.loop import train
    from summarizer_tpu.utils.config import HParameters

    with h5py.File(out_h5) as f:
        keys = sorted(f.keys())
    sp = str(tmp_path / "summe_rehearsal_splits.json")
    write_splits([{"train_keys": keys[:4], "test_keys": keys[4:]}], sp)
    hps = HParameters().load_from_args(
        dict(
            model="logistic", datasets=out_h5, splits_files=sp, epochs=2,
            test_every_epochs=1, log_dir=str(tmp_path / "logs"),
            tensorboard=False, log_level="warning",
            extra_params={"input_size": 64},
        )
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_normalize_tvsum_user_scores(tmp_path, monkeypatch):
    """TVSum normalization: /user_scores = (user_anno - 1) / 4 and
    /video_name from the info TSV (normalize_datasets.py:20-41), with the
    tvsum50 .mat loader mocked (the real one needs hdf5storage + the 600 MB
    original annotations)."""
    from summarizer_tpu.data import normalize as nz

    eccv = str(tmp_path / "eccv_tvsum.h5")
    _eccv16_summe_h5(eccv, n_videos=2)
    n_frames = []
    with h5py.File(eccv) as f:
        for k in sorted(f.keys()):
            n_frames.append(int(np.asarray(f[k]["n_frames"][()]).reshape(-1)[0]))

    rng = np.random.RandomState(0)
    fake_mat = [
        {"user_anno": rng.randint(1, 6, size=(nf, 4)).astype(np.float64)}
        for nf in n_frames
    ]
    monkeypatch.setattr(
        "summarizer_tpu.data.io_mat.load_tvsum_mat", lambda path: fake_mat
    )
    tsv = str(tmp_path / "info.tsv")
    with open(tsv, "w") as f:
        f.write("video_id\ttitle\n" + "".join(f"vid_{i}\tt{i}\n" for i in range(2)))

    out = str(tmp_path / "summarizer_tvsum.h5")
    nz.normalize_tvsum(eccv, out, tvsum_mat="unused.mat", info_tsv=tsv)
    with h5py.File(out) as f:
        for i, k in enumerate(sorted(f.keys())):
            us = f[k]["user_scores"][...]
            assert us.shape == (4, n_frames[i])  # users x frames (anno.T)
            assert us.min() >= 0.0 and us.max() <= 1.0  # (1..5 - 1) / 4
            expect = (fake_mat[i]["user_anno"].T - 1.0) / 4.0
            np.testing.assert_allclose(us, expect)
            assert f[k]["video_name"][()].decode() == f"vid_{i}"
