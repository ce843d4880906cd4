"""Real-data download CLI — the reference ``utils/getRealData.py``.

Same interface (reference getRealData.py:12-38): downloads the real
Duckietown videos listed in a URL file (``realVideoURLs.txt``) and
optionally explodes them into PNG frames.

Uses urllib instead of shelling out to wget.  In a zero-egress
environment downloads fail cleanly per file and the explode step still
works on already-present videos.
"""
from __future__ import annotations

import argparse
import logging
import os
import urllib.request

import cv2

from . import common

log = logging.getLogger(__name__)


def download(url: str, out_dir: str) -> str | None:
    fname = os.path.join(out_dir, url.rstrip("/").split("/")[-1])
    if os.path.exists(fname):
        return fname
    try:
        urllib.request.urlretrieve(url, fname)
        return fname
    except Exception as e:
        log.warning("download failed for %s: %s", url, e)
        return None


def explode(video_path: str, frames_dir: str, counter: int) -> int:
    cap = cv2.VideoCapture(video_path)
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        cv2.imwrite(os.path.join(frames_dir, f"{counter:06d}.png"), frame)
        counter += 1
    cap.release()
    return counter


# the 78-entry manifest of real Duckietown drive videos the reference
# shipped (rightLaneNetwork/utils/realVideoURLs.txt) — packaged so the
# CLI finds its default manifest without any checkout-relative path
DEFAULT_URL_FILE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "data", "assets", "realVideoURLs.txt")


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--urlFile", type=str, default="realVideoURLs.txt")
    p.add_argument("--outputPath", type=str, default="./realVideos")
    p.add_argument("--explode", action="store_true",
                   help="Explode downloaded videos into PNG frames")
    p.add_argument("--framesPath", type=str, default="./realFrames")
    p.add_argument("--imitate", action="store_true",
                   help="Dry-run: list what would be downloaded, no "
                        "network, no writes (createRealDB.py-style smoke)")
    args = p.parse_args(args)

    urls = []
    url_file = args.urlFile
    if not os.path.exists(url_file):
        if args.urlFile != "realVideoURLs.txt":
            # an explicitly-passed manifest that doesn't exist is an
            # error, not a cue to download all 78 reference videos
            p.error(f"--urlFile {args.urlFile!r} not found")
        url_file = DEFAULT_URL_FILE
    if os.path.exists(url_file):
        with open(url_file) as f:
            urls = [u.strip() for u in f if u.strip()]

    if args.imitate:
        for u in urls[:5]:
            log.info("would download %s", u)
        log.info("imitate: %d urls from %s", len(urls), url_file)
        return {"videos": 0, "frames": 0, "urls": len(urls)}

    os.makedirs(args.outputPath, exist_ok=True)

    videos = []
    for url in urls:
        got = download(url, args.outputPath)
        if got:
            videos.append(got)
    # include any videos already on disk
    for f in sorted(os.listdir(args.outputPath)):
        path = os.path.join(args.outputPath, f)
        if path not in videos and f.lower().endswith((".avi", ".mp4", ".mov")):
            videos.append(path)

    n_frames = 0
    if args.explode:
        os.makedirs(args.framesPath, exist_ok=True)
        for v in videos:
            n_frames = explode(v, args.framesPath, n_frames)

    log.info("videos: %d, frames: %d", len(videos), n_frames)
    return {"videos": len(videos), "frames": n_frames}


if __name__ == "__main__":
    main()
