"""Image acquisition for the Hateful Memes dataset.

TPU-side training consumes precomputed features (LMDB/HDF5) — images are only
needed by the nine on-the-fly extractor pipelines. This module mirrors the
reference's acquisition behavior (data_processing/nodes.py:111-167): a Google
Drive tarball download (via gdown when installed), archive extraction, and a
per-image HTTP fallback from the ``limjiayi/hateful_memes_expanded`` HF
dataset for anything still missing.

Differences from the reference, deliberate:
  * the tarball is extracted with a path-traversal guard (the reference calls
    ``tar.extractall`` bare);
  * the downloader and the HTTP fetcher are injectable, so the whole flow —
    extract, per-file fallback, img_path wiring — is exercised offline by
    ``tests/test_data.py`` with a fabricated tarball and an in-memory fetcher;
  * everything network-touching is gated and reports what it skipped instead
    of raising, so offline runs degrade to "N images missing" rather than
    crashing the pipeline.
"""

from __future__ import annotations

import logging
import os
import tarfile
from typing import Callable, Iterable, Optional

logger = logging.getLogger(__name__)

# reference data_processing/nodes.py:126-129 / :147-149
GDRIVE_IMG_URL = "https://drive.google.com/uc?id=1VZ2WQrh4MRStFfWRSx0ezYJ_DlcaCGwI"
HF_EXPANDED_BASE_URL = (
    "https://huggingface.co/datasets/limjiayi/hateful_memes_expanded/resolve/main"
)


def _default_fetch(url: str) -> bytes:
    """HTTP GET → body bytes (urllib: no extra dependency)."""
    from urllib.request import urlopen

    with urlopen(url, timeout=60) as resp:  # noqa: S310 — https URLs only
        if getattr(resp, "status", 200) >= 400:
            raise OSError(f"HTTP {resp.status} for {url}")
        return resp.read()


def _default_gdrive_download(url: str, dest: str) -> None:
    """Google Drive archive download. gdown handles the confirm-token dance
    for large files; plain urllib cannot, so without gdown we skip straight
    to the per-image fallback."""
    try:
        import gdown  # type: ignore[import-not-found]
    except ImportError as e:
        raise OSError("gdown not installed — skipping archive download") from e
    gdown.download(url, dest, quiet=False)


def safe_extract_tar(archive_path: str, dest_dir: str) -> int:
    """Extract a .tar.gz, refusing members that escape ``dest_dir``
    (absolute paths or ``..`` traversal). Returns the file count."""
    dest_real = os.path.realpath(dest_dir)
    n = 0
    with tarfile.open(archive_path, "r:gz") as tar:
        for member in tar.getmembers():
            target = os.path.realpath(os.path.join(dest_dir, member.name))
            if not (target == dest_real or target.startswith(dest_real + os.sep)):
                raise ValueError(f"unsafe tar member path: {member.name!r}")
            tar.extract(member, dest_dir)
            if member.isfile():
                n += 1
    return n


def acquire_images(
    data_dir: str,
    image_names: Iterable[str],
    *,
    gdrive_url: str = GDRIVE_IMG_URL,
    base_url: str = HF_EXPANDED_BASE_URL,
    download_archive: Optional[Callable[[str, str], None]] = None,
    fetch: Optional[Callable[[str], bytes]] = None,
    skip_archive_threshold: int = 100,
) -> dict:
    """Ensure every relative image path in ``image_names`` (e.g. ``img/01234
    .png``) exists under ``data_dir``.

    Order mirrors the reference: (1) if ``img/`` already holds more than
    ``skip_archive_threshold`` files, skip the archive; (2) otherwise
    download (gdown) and/or extract ``img.tar.gz``; (3) fetch whatever is
    still missing per-file from ``base_url``. Returns a stats dict
    ``{"extracted", "fetched", "missing", "skipped_archive"}``.
    """
    download_archive = download_archive or _default_gdrive_download
    fetch = fetch or _default_fetch
    names = [str(n) for n in dict.fromkeys(image_names)]  # dedup, keep order
    img_dir = os.path.join(data_dir, "img")
    archive_path = os.path.join(data_dir, "img.tar.gz")
    os.makedirs(img_dir, exist_ok=True)

    stats = {"extracted": 0, "fetched": 0, "missing": 0, "skipped_archive": False}
    if len(os.listdir(img_dir)) > skip_archive_threshold:
        logger.info("images already present in %s, skipping archive", img_dir)
        stats["skipped_archive"] = True
    else:
        if not os.path.exists(archive_path):
            try:
                logger.info("downloading image archive from Google Drive ...")
                download_archive(gdrive_url, archive_path)
            except Exception as e:
                logger.warning(
                    "archive download failed (%s) — falling back to "
                    "per-image fetch", e)
        if os.path.exists(archive_path):
            logger.info("extracting %s ...", archive_path)
            stats["extracted"] = safe_extract_tar(archive_path, data_dir)

    for name in names:
        img_path = os.path.join(data_dir, name)
        if os.path.exists(img_path):
            continue
        try:
            body = fetch(f"{base_url}/{name}")
            os.makedirs(os.path.dirname(img_path), exist_ok=True)
            with open(img_path, "wb") as f:
                f.write(body)
            stats["fetched"] += 1
        except Exception as e:
            logger.warning("failed to fetch %s: %s", name, e)
            stats["missing"] += 1

    if stats["fetched"]:
        logger.info("fetched %d missing images from %s", stats["fetched"], base_url)
    if stats["missing"]:
        logger.warning("%d images still missing under %s", stats["missing"], img_dir)
    return stats
