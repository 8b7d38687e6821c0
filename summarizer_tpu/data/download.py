"""Dataset fetching (ref: summarizer/utils/io.py:15-36 and
datasets/download_datasets.py:11-24).

Downloads the three preprocessed ``summarizer_dataset_*_google_pool5.h5``
files from Google Drive, handling the large-file confirm-token redirect.
Requires network egress; in air-gapped environments use
``summarizer_tpu.data.synthetic`` to generate schema-complete fixtures.
"""

from __future__ import annotations

import os

GDRIVE_FILES = {
    # file-id -> destination (ids from datasets/download_datasets.py:13-17)
    "1LUcnvGpGzt5X59-x72N02k-zXm5dt9Hn": "summarizer_dataset_summe_google_pool5.h5",
    "1Ur-q0O9gi-VgBLNM7X8bdhSkcoI-CrnC": "summarizer_dataset_tvsum_google_pool5.h5",
    "1suaESy2yxuCshcLFN-7IjmtvEXOL4nrV": "summarizer_dataset_LOL_google_pool5.h5",
}

_URL = "https://docs.google.com/uc?export=download"
_CHUNK = 32768


def _confirm_token(response):
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            return value
    return None


def download_file_from_google_drive(file_id: str, destination: str):
    import requests

    session = requests.Session()
    response = session.get(_URL, params={"id": file_id}, stream=True)
    token = _confirm_token(response)
    if token:
        response = session.get(
            _URL, params={"id": file_id, "confirm": token}, stream=True
        )
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
    with open(destination, "wb") as f:
        for chunk in response.iter_content(_CHUNK):
            if chunk:
                f.write(chunk)


def _valid_h5(path: str) -> bool:
    """True if ``path`` opens as an HDF5 file with at least one video group
    (Drive quota/intercept pages arrive as HTML with a 200 status)."""
    try:
        import h5py

        with h5py.File(path, "r") as f:
            return len(f.keys()) > 0
    except OSError:
        return False


def download_datasets(dest_dir: str = "datasets") -> dict:
    """Fetch the three real datasets; degrades gracefully without egress.

    Returns {name: "ok" | "exists" | "failed: <reason>"}.  Existing valid
    files are kept; failed/partial downloads are removed so a later retry
    (or the synthetic generator) starts clean.
    """
    status = {}
    for file_id, name in GDRIVE_FILES.items():
        dest = os.path.join(dest_dir, name)
        if os.path.exists(dest) and _valid_h5(dest):
            print(f"{name}: already present, skipping")
            status[name] = "exists"
            continue
        print(f"Downloading {name} ...")
        try:
            download_file_from_google_drive(file_id, dest)
            if not _valid_h5(dest):
                raise OSError("response was not a valid HDF5 file (quota page?)")
            print(f"  -> {dest}")
            status[name] = "ok"
        except Exception as e:  # noqa: BLE001 — report every failure mode
            if os.path.exists(dest):
                os.remove(dest)
            print(f"  FAILED: {type(e).__name__}: {e}")
            status[name] = f"failed: {e}"
    if not any(v in ("ok", "exists") for v in status.values()):
        print(
            "\nNo dataset could be downloaded (no network egress?).\n"
            "Offline alternative (schema-complete fixtures):\n"
            "  python -m summarizer_tpu.cli.download --synthetic"
        )
    return status
