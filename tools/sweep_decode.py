"""Sweep all reference conformance streams through our decoder vs h264dec goldens.

Usage: python tools/sweep_decode.py [--streams a.264 b.264 ...]
Prints one line per stream: PASS / MISMATCH / FAIL(<exc>) / REFFAIL.
"""
import os
import subprocess
import sys
import traceback

RES = "/root/reference/res"
GOLD = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "golden")
DECBIN = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "src", "h264dec")


def golden(stream):
    path = os.path.join(GOLD, stream + ".yuv")
    if not os.path.exists(path):
        os.makedirs(GOLD, exist_ok=True)
        r = subprocess.run([DECBIN, os.path.join(RES, stream), path],
                           capture_output=True, timeout=300)
        if r.returncode != 0:
            return None
    with open(path, "rb") as f:
        return f.read()


def main():
    from openh264_tpu.decoder import H264Decoder
    if "--streams" in sys.argv:
        streams = sys.argv[sys.argv.index("--streams") + 1:]
    else:
        streams = sorted(f for f in os.listdir(RES)
                         if f.endswith((".264", ".jsv", ".h264")))
    npass = 0
    for s in streams:
        try:
            gold = golden(s)
        except Exception:
            gold = None
        if gold is None:
            print(f"{s:55s} REFFAIL")
            continue
        try:
            with open(os.path.join(RES, s), "rb") as f:
                data = f.read()
            frames = H264Decoder().decode_annexb(data)
            out = b"".join(p.tobytes() for fr in frames for p in fr.planes())
            if out == gold:
                print(f"{s:55s} PASS ({len(frames)} frames)")
                npass += 1
            else:
                ours_n = len(frames)
                print(f"{s:55s} MISMATCH (ours {len(out)}B/{ours_n}f vs gold {len(gold)}B)")
        except Exception as e:
            print(f"{s:55s} FAIL {type(e).__name__}: {e}")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"== {npass}/{len(streams)} bit-exact ==")


if __name__ == "__main__":
    main()
