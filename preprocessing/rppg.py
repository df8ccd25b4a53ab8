"""Offline rPPG heart-rate measure precomputation.

Equivalent of /root/reference/preprocessing/rppg.py: for each MAHNOB-HCI
session BDF, slide 10-sec ECG segments, notch-filter/scale/4x-resample,
run heartpy, keep the best channel by sdnn with bpm in [41, 180], and pickle
``{"idx": sample_ends, "data": measures}`` to ``Measures/<session>/data.pickle``
plus a ``meta.pickle`` summary consumed by the RPPG dataset.

Requires the optional pyedflib + heartpy deps (not baked into this image);
the tool degrades to a clear error message without them.
"""

from __future__ import annotations

import argparse
import math
import pickle
import xml.etree.ElementTree as ET
from glob import glob
from os import path, makedirs
from sys import stderr

import numpy as np

SEGMENT_SECONDS = 10


def build_session_meta(session_dir: str) -> dict:
    """Parse session.xml + BDF headers into the flat meta dict the RPPG
    dataset consumes (reference SessionMeta, src/datasets.py:33-193)."""
    from pyedflib import highlevel as BDFReader  # type: ignore

    xml_path = path.join(session_dir, "session.xml")
    root = ET.parse(xml_path).getroot()
    videos = sorted(glob(path.join(session_dir, "*.avi")))
    bdfs = sorted(glob(path.join(session_dir, "*.bdf")))
    if not videos or not bdfs:
        raise FileNotFoundError(f"missing avi/bdf in {session_dir}")
    video_path, bdf_path = videos[0], bdfs[0]

    import cv2

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()

    _, signal_headers, header = BDFReader.read_edf(bdf_path, ch_names=["EXG1"])
    hr_freq = signal_headers[0]["sample_frequency"]

    # The HCI protocol: 30s stimulation offset before/after the clip proper.
    flag_offset_s = 30.0
    duration = n_frames / fps - 2 * flag_offset_s

    return {
        "session_dir": session_dir,
        "video_path": video_path,
        "bdf_path": bdf_path,
        "session_video_sample_freq": fps,
        "session_video_beg_sample": 0,
        "flag_video_beg_sample": int(flag_offset_s * fps),
        "session_hr_sample_freq": hr_freq,
        "flag_hr_beg_sample": int(flag_offset_s * hr_freq),
        "duration": max(duration, 0.0),
    }


def measure_segment(data: np.ndarray, freq: float):
    import heartpy as hp  # type: ignore
    from scipy.signal import resample

    data = hp.filter_signal(data, cutoff=0.05, sample_rate=freq, filtertype="notch")
    data = (data - data.min()) / (data.max() - data.min()) * 3.4
    data = resample(data, len(data) * 4)
    _, measures = hp.process(hp.scale_data(data), freq * 4)
    return measures


def pre_calculate_bpm(session_dir: str, meta: dict) -> dict:
    from pyedflib import highlevel as BDFReader  # type: ignore

    signals, headers, _ = BDFReader.read_edf(
        meta["bdf_path"], ch_names=["EXG1", "EXG2", "EXG3", "Status"]
    )
    freq = meta["session_hr_sample_freq"]
    seg = int(freq * SEGMENT_SECONDS)
    idx, data = [], []
    for end in range(seg, signals.shape[1], seg):
        candidates = []
        for ch in range(3):
            try:
                measures = measure_segment(signals[ch][end - seg : end], freq)
                if not (41 <= measures["bpm"] <= 180):
                    continue
                if any(isinstance(v, float) and math.isnan(v) for v in measures.values()):
                    continue
                candidates.append(measures)
            except Exception:
                continue
        if candidates:
            idx.append(end)
            data.append(sorted(candidates, key=lambda m: m["sdnn"])[0])
    return {"idx": idx, "data": data}


def main(args):
    try:
        import heartpy  # noqa: F401
        import pyedflib  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            f"rppg preprocessing requires pyedflib + heartpy ({e}); "
            "install them to run this offline tool"
        )

    sessions = sorted(glob(path.join(args.data_dir, "Sessions", "*")))
    for i, session_dir in enumerate(sessions):
        name = path.basename(session_dir)
        meta_out = path.join(args.data_dir, "Metas", name, "meta.pickle")
        measure_out = path.join(args.data_dir, "Measures", name, "data.pickle")
        if path.isfile(meta_out) and path.isfile(measure_out):
            continue
        print(f"[{i + 1}/{len(sessions)}] {name}", file=stderr)
        try:
            meta = build_session_meta(session_dir)
            makedirs(path.dirname(meta_out), exist_ok=True)
            with open(meta_out, "wb") as f:
                pickle.dump(meta, f)
            measures = pre_calculate_bpm(session_dir, meta)
            makedirs(path.dirname(measure_out), exist_ok=True)
            with open(measure_out, "wb") as f:
                pickle.dump(measures, f)
        except Exception as e:
            print(f"failed on {session_dir}: {e}", file=stderr)


def get_argparser():
    parser = argparse.ArgumentParser(description="rPPG measure precomputation")
    parser.add_argument("--data_dir", required=True, type=str, help="HCI root")
    return parser


if __name__ == "__main__":
    main(get_argparser().parse_args())
