"""Slice-parallel encoding over a TPU device mesh.

TPU-native analog of the reference's slice-parallel multithreading
(codec/encoder/core/src/slice_multi_threading.cpp, SM_FIXEDSLCNUM_SLICE
mode): each H.264 slice is a horizontal band of MB rows; slices are
independent for intra prediction and entropy coding (spec §8.3, §9),
while inter prediction may cross slice boundaries. Here the bands live
on different mesh devices via shard_map:

- I step: each device runs the wavefront intra encode on its own band —
  no communication at all (slice == shard boundary, has_top=False at the
  band's first MB row exactly matches slice intra semantics).
- P step: reference planes are exchanged with an all_gather along the
  slice axis (ICI collective) so motion search/compensation can reach
  outside the band; everything else stays band-local.

Entropy assembly then emits one NAL per slice on the host, which is
exactly multi-slice Annex-B output — bit-compatible with any H.264
decoder and identical in structure to the reference's multi-slice mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encoder import core_jax


def make_mesh(n_devices: int | None = None, axis: str = "slices") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def _band_spec():
    return P("slices", None)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h_band", "mesh"))
def sliced_i_step(y, u, v, qp, qp_c, *, mb_w: int, mb_h_band: int, mesh: Mesh):
    """Sharded I-frame encode: y [H, W] sharded by rows over `slices`.

    Each device encodes its band as an independent H.264 slice.
    Returns per-band symbol tensors (leading axis = slice) and the
    recon planes (sharded the same way).
    """
    def band(yb, ub, vb):
        out = core_jax.encode_i_frame(yb, ub, vb, qp, qp_c,
                                      mb_w=mb_w, mb_h=mb_h_band)
        # keep a leading slice axis for the out-sharding
        return {k: val[None] for k, val in out.items()}

    f = jax.shard_map(
        band, mesh=mesh, check_vma=False,
        in_specs=(_band_spec(), _band_spec(), _band_spec()),
        out_specs={
            "i16_mode": P("slices"), "chroma_mode": P("slices"),
            "luma_dc": P("slices"), "luma_ac": P("slices"),
            "chroma_dc": P("slices"), "chroma_ac": P("slices"),
            "recon_y": P("slices"), "recon_u": P("slices"),
            "recon_v": P("slices"),
        })
    return f(y, u, v)


@functools.partial(jax.jit,
                   static_argnames=("mb_w", "mb_h_band", "sr", "mesh"))
def sliced_p_step(y, u, v, ref_y, ref_u, ref_v, qp, qp_c, *,
                  mb_w: int, mb_h_band: int, sr: int = 8, mesh: Mesh):
    """Sharded P-frame encode. Inputs and reference planes are sharded
    by rows; the reference is all_gathered along `slices` (ICI) so ME/MC
    can cross band boundaries like the spec allows."""
    def band(yb, ub, vb, ryb, rub, rvb):
        ry = jax.lax.all_gather(ryb, "slices", tiled=True)
        ru = jax.lax.all_gather(rub, "slices", tiled=True)
        rv = jax.lax.all_gather(rvb, "slices", tiled=True)
        row_off = jax.lax.axis_index("slices") * (mb_h_band * 16)
        out = core_jax.encode_p_frame(yb, ub, vb, ry, ru, rv, qp, qp_c,
                                      mb_w=mb_w, mb_h=mb_h_band, sr=sr,
                                      row_off=row_off)
        return {k: val[None] for k, val in out.items()}

    out_specs = {k: P("slices") for k in
                 ("mv", "inter_cost", "intra_cost_proxy", "luma_ac",
                  "chroma_dc", "chroma_ac", "recon_y", "recon_u", "recon_v",
                  "skip_mask", "skip_sad")}
    f = jax.shard_map(
        band, mesh=mesh, check_vma=False,
        in_specs=(_band_spec(),) * 6,
        out_specs=out_specs)
    return f(y, u, v, ref_y, ref_u, ref_v)


class SliceParallelEncoder:
    """Multi-slice encoder session: device-sharded compute + per-slice
    host entropy (one NAL per slice, SM_FIXEDSLCNUM semantics)."""

    def __init__(self, cfg, mesh: Mesh):
        from ..encoder.encoder import H264Encoder
        self.cfg = cfg
        self.mesh = mesh
        self.n_slices = mesh.devices.size
        if cfg.mb_height % self.n_slices:
            raise ValueError(
                f"mb_height {cfg.mb_height} not divisible by "
                f"{self.n_slices} slices")
        self.mb_h_band = cfg.mb_height // self.n_slices
        self._host = H264Encoder(cfg)

    def device_put(self, plane):
        return jax.device_put(
            plane, NamedSharding(self.mesh, _band_spec()))

    def encode_i_symbols(self, y, u, v, qp, qp_c):
        return sliced_i_step(self.device_put(y), self.device_put(u),
                             self.device_put(v), qp, qp_c,
                             mb_w=self.cfg.mb_width,
                             mb_h_band=self.mb_h_band, mesh=self.mesh)

    def encode_p_symbols(self, y, u, v, ref, qp, qp_c):
        ry, ru, rv = (self.device_put(p) for p in ref)
        return sliced_p_step(self.device_put(y), self.device_put(u),
                             self.device_put(v), ry, ru, rv, qp, qp_c,
                             mb_w=self.cfg.mb_width,
                             mb_h_band=self.mb_h_band, mesh=self.mesh)

    def encode_frame(self, y, u, v):
        """Full multi-slice frame encode: mesh-sharded compute, then
        per-slice host entropy through the session encoder — one NAL per
        band, exactly the single-device num_slices output (tests assert
        byte equality)."""
        import numpy as np
        from ..bitstream.nal import make_annexb_nal
        from ..bitstream import NAL_IDR, NAL_SLICE
        from ..decoder.framedata import FrameSymbols
        from ..oracle.deblock import deblock_frame
        from ..encoder.encoder import _Planes, _RefEntry
        from ..encoder.core_np import pad_to_mb

        host = self._host
        cfg = self.cfg
        is_idr = host.frame_count == 0 or (
            cfg.idr_interval > 0 and
            host.frame_count % cfg.idr_interval == 0)
        host.frame_count += 1
        host.qp = host.rc.frame_qp(is_idr, 0)
        from ..tables import CHROMA_QP_TABLE
        host.qp_c = int(CHROMA_QP_TABLE[np.clip(
            host.qp + cfg.chroma_qp_offset, 0, 51)])
        yp, up, vp = pad_to_mb(y), pad_to_mb(u, 8), pad_to_mb(v, 8)
        bh = self.mb_h_band
        n_s = self.n_slices
        nals = []
        if is_idr:
            host.frame_num = 0
            host.coding_idx = 0
            host.dpb.clear()
            prefix = host.headers_annexb()
            host.idr_pic_id = (host.idr_pic_id + 1) % 16
            sym = self.encode_i_symbols(yp, up, vp, host.qp, host.qp_c)
            sym = {k: np.asarray(a) for k, a in sym.items()}
            outs = [{k: a[sidx] for k, a in sym.items()} for sidx in range(n_s)]
            for sidx, out in enumerate(outs):
                rbsp = host._write_i_slice(out, mb_h=bh,
                                           first_mb=sidx * bh * cfg.mb_width)
                nals.append(make_annexb_nal(3, NAL_IDR, rbsp))
        else:
            prefix = b""
            ref = host.dpb[-1]
            sym = self.encode_p_symbols(yp, up, vp, ref.planes, host.qp,
                                        host.qp_c)
            sym = {k: np.asarray(a) for k, a in sym.items()}
            outs = [{k: a[sidx] for k, a in sym.items()} for sidx in range(n_s)]
            for sidx, out in enumerate(outs):
                out["intra_mask"] = np.zeros(cfg.mb_width * bh, bool)
                rbsp = host._write_p_slice(out, True, None, mb_h=bh,
                                           first_mb=sidx * bh * cfg.mb_width)
                nals.append(make_annexb_nal(2, NAL_SLICE, rbsp))
        per_mb = [k for k in outs[0]
                  if k not in ("recon_y", "recon_u", "recon_v")]
        out_m = {k: np.concatenate([o[k] for o in outs]) for k in per_mb}
        for k in ("recon_y", "recon_u", "recon_v"):
            out_m[k] = np.concatenate([o[k] for o in outs])
        fs = (host._frame_symbols_i(out_m) if is_idr
              else host._frame_symbols_p(out_m))
        for sidx in range(n_s):
            fs.slice_id[sidx * bh * cfg.mb_width:(sidx + 1) * bh * cfg.mb_width] = sidx
        recon = _Planes(out_m["recon_y"], out_m["recon_u"], out_m["recon_v"])
        if cfg.deblock_idc != 1:
            deblock_frame(recon, fs)
        host.dpb.append(_RefEntry(host.frame_num, host.coding_idx, 0,
                                  (recon.y, recon.u, recon.v)))
        if len(host.dpb) > cfg.num_ref_frames:
            host.dpb.pop(0)
        host.frame_num = (host.frame_num + 1) % (1 << cfg.log2_max_frame_num)
        host.coding_idx += 1
        bs = prefix + b"".join(nals)
        host.rc.update(8 * len(bs), host.qp, is_idr)
        return bs
