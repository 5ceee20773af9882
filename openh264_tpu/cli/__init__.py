"""Console applications mirroring the reference's codec/console tools
(`h264enc` / `h264dec`, reference codec/console/enc/src/welsenc.cpp and
codec/console/dec/src/h264dec.cpp).
"""
