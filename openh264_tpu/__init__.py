"""openh264_tpu — a TPU-native H.264/AVC encode/decode engine.

Built from scratch in JAX/XLA/Pallas with the capability surface of
cisco/openh264 (reference: /root/reference, v2.6.0):

- Encoder: Constrained Baseline, CAVLC/CABAC entropy, rate control,
  temporal scalability, LTR/MMCO, multi-slice parallel encode, simulcast.
- Decoder: CBP officially plus CABAC, B-slices, weighted prediction,
  8x8 transform, scaling lists, IPCM, FMO, error concealment.

Architecture (TPU-first, not a translation):
- Frames are [H, W] u8 plane tensors; the macroblock grid is a batched
  tensor axis. Per-MB work (intra pred, ME, transforms, deblocking) runs
  as batched/jitted JAX + Pallas kernels over all MBs of a slice,
  wavefronted over neighbor dependencies.
- Entropy coding is two-phase: parallel per-MB symbolization on device,
  sequential bit-exact pack/parse on host.
- Scale-out: slices/frames/GOPs shard over a jax.sharding.Mesh.

Package map (mirrors SURVEY.md §2 component inventory):
- bitstream/  bit I/O, exp-Golomb, NAL escaping (ref codec/common golomb)
- tables/     H.264 spec constant tables (zigzag, quant, VLC, CABAC, deblock)
- oracle/     numpy bit-exact reference implementations of every kernel
- ops/        JAX/Pallas batched kernels (oracle-tested)
- decoder/    parser + slice decode + recon + DPB + EC
- encoder/    MD/ME + transforms + entropy write + RC + ref mgmt
- parallel/   mesh construction, sharded pipelines
- api/        parameter dataclasses + encoder/decoder session API
- cli/        h264enc / h264dec compatible console tools
"""

__version__ = "0.1.0"
