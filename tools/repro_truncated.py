"""Reproduce decoder crashes quickly by feeding a prefix of N NALs.

Usage: python tools/repro_truncated.py <stream> <num_nals>
"""
import sys
import traceback

from openh264_tpu.bitstream import split_annexb
from openh264_tpu.decoder import H264Decoder

path, n = sys.argv[1], int(sys.argv[2])
data = open(path, "rb").read()
# find byte offsets of start codes so we can truncate on a NAL boundary
offs = []
i = 0
while True:
    j = data.find(b"\x00\x00\x01", i)
    if j < 0:
        break
    offs.append(j)
    i = j + 3
print(f"{len(offs)} NALs total")
end = offs[n] if n < len(offs) else len(data)
try:
    frames = H264Decoder().decode_annexb(data[:end])
    print(f"OK: {len(frames)} frames")
except Exception:
    traceback.print_exc()
