"""Native GIF decoder pins — hand-built spec bytes (GIF89a spec,
CompuServe 1990; LZW per Welch 1984), mirroring the JPEG suite's
strategy: the expected rasters are derived by hand from the spec, the
code stream is packed by an independent LSB-first writer with
hand-chosen codes, and every out-of-scope variant must DECLINE as
NotImplementedError so the PIL fallthrough stays reachable."""

import numpy as np
import pytest


def _pack_lsb(codes: list[tuple[int, int]]) -> bytes:
    """(value, width) code list → LSB-first packed bytes (the GIF
    LZW bit order) — an independent re-implementation used only to
    author test vectors."""
    acc = 0
    nbits = 0
    out = bytearray()
    for v, w in codes:
        acc |= v << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


RED, GREEN = (255, 0, 0), (0, 255, 0)
PALETTE = bytes(RED) + bytes(GREEN)  # 2-entry GCT (packed size bits 0)


def _gif(w, h, codes, *, interlace=False, extensions=b"", palette=PALETTE,
         gct=True, descriptor=None, trailer=True, extra_frames=b""):
    hdr = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    packed = (0x80 | 0x00) if gct else 0x00  # GCT flag, size 0 → 2 colors
    hdr += bytes([packed, 0, 0])
    if gct:
        hdr += palette
    left, top, fw, fh = descriptor or (0, 0, w, h)
    img = (
        b"\x2c"
        + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        + fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0x00])
        + b"\x02"  # LZW min code size 2
        + _subblocks(_pack_lsb(codes))
    )
    return hdr + extensions + img + extra_frames + (b"\x3b" if trailer else b"")


# mcs=2: CLEAR=4, END=5, width starts at 3. Pixels 0,1,1,0 —
# decoder appends entries 6,7 then widens to 4 bits when the table
# hits 8, so the last literal and END are 4-bit codes.
CODES_0110 = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]


class TestNativeGif:
    def test_hand_built_2x2(self):
        from suckit_ray.stages.media import _parse_gif

        meta, raster = _parse_gif(_gif(2, 2, CODES_0110))
        assert (meta["width"], meta["height"], meta["channels"]) == (2, 2, 3)
        assert meta["format"] == "gif"
        want = np.array(
            [[RED, GREEN], [GREEN, RED]], dtype=np.uint8
        )
        assert (raster == want).all()

    def test_interlaced_deinterlaces(self):
        from suckit_ray.stages.media import _parse_gif

        # 1×4 canvas, natural rows r0..r3 = 0,1,1,0. Interlace passes
        # for h=4 store canvas rows in order [0, 2, 1, 3] → stored
        # pixel sequence 0,1,1,0 maps back to natural 0,1,1,0 with
        # rows 1 and 2 SWAPPED in storage, i.e. stored = r0,r2,r1,r3.
        # Choose natural rows 0,1,1,0 → stored sequence 0,1,1,0 is
        # symmetric; use asymmetric rows instead: natural r0..r3 =
        # 0,0,1,1 → stored order r0,r2,r1,r3 = 0,1,0,1.
        codes = [(4, 3), (0, 3), (1, 3), (0, 3), (1, 4), (5, 4)]
        _, raster = _parse_gif(_gif(1, 4, codes, interlace=True))
        want = np.array(
            [[RED], [RED], [GREEN], [GREEN]], dtype=np.uint8
        )
        assert (raster == want).all()

    def test_transparency_declines(self):
        from suckit_ray.stages.media import _parse_gif, _parse_image_native

        gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # transparent flag set
        blob = _gif(2, 2, CODES_0110, extensions=gce)
        with pytest.raises(NotImplementedError, match="transparency"):
            _parse_gif(blob)
        assert _parse_image_native(blob) is None  # PIL stays reachable

    def test_opaque_gce_is_skipped(self):
        from suckit_ray.stages.media import _parse_gif

        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # no transparency
        _, raster = _parse_gif(_gif(2, 2, CODES_0110, extensions=gce))
        assert raster.shape == (2, 2, 3)

    def test_animated_declines(self):
        from suckit_ray.stages.media import _parse_gif

        frame2 = (
            b"\x2c" + (0).to_bytes(2, "little") * 2
            + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + b"\x00\x02" + _subblocks(_pack_lsb(CODES_0110))
        )
        with pytest.raises(NotImplementedError, match="animated"):
            _parse_gif(_gif(2, 2, CODES_0110, extra_frames=frame2))

    def test_partial_canvas_declines(self):
        from suckit_ray.stages.media import _parse_gif

        with pytest.raises(NotImplementedError, match="partial-canvas"):
            _parse_gif(_gif(4, 4, CODES_0110, descriptor=(0, 0, 2, 2)))

    def test_truncated_stream_declines(self):
        from suckit_ray.stages.media import _parse_gif, _parse_image_native

        blob = _gif(2, 2, CODES_0110)[:-6]
        with pytest.raises(NotImplementedError):
            _parse_gif(blob)
        assert _parse_image_native(blob) is None

    def test_no_color_table_declines(self):
        from suckit_ray.stages.media import _parse_gif

        with pytest.raises(NotImplementedError, match="color table"):
            _parse_gif(_gif(2, 2, CODES_0110, gct=False))

    def test_meta_native_header_only(self):
        from suckit_ray.stages.media import _image_meta_native

        meta = _image_meta_native(_gif(2, 2, CODES_0110))
        assert meta == {
            "width": 2, "height": 2, "channels": 3,
            "format": "gif", "n_bytes": len(_gif(2, 2, CODES_0110)),
        }

    def test_resize_path_never_reencodes_gif_natively(self, monkeypatch):
        # GIF has a native DECODER only — the resize stage must route
        # it to PIL (in-format re-encode), never repack the raster in
        # another container; and must not waste the native decode
        import suckit_ray.stages.media as media

        called = []
        monkeypatch.setattr(
            media, "_parse_image_native", lambda d: called.append(1) or None
        )
        r = media.ResizeImage(2, 2, fake=False)
        try:
            r._real_resize(_gif(2, 2, CODES_0110))
        except Exception:
            pass  # PIL may be absent — the pin is the skip below
        assert called == []

    def test_pil_crosscheck_roundtrip(self):
        # skip-unless-importable cross-check on a realistic LZW stream
        PIL = pytest.importorskip("PIL.Image")
        import io

        rng = np.random.RandomState(11)
        arr = rng.randint(0, 4, size=(16, 16), dtype=np.uint8)
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        img = PIL.fromarray(arr, mode="P")
        img.putpalette(pal.reshape(-1).tolist())
        buf = io.BytesIO()
        img.save(buf, format="GIF")
        from suckit_ray.stages.media import _parse_gif

        meta, raster = _parse_gif(buf.getvalue())
        assert (meta["width"], meta["height"]) == (16, 16)
        assert (raster == pal[arr]).all()


class TestGifMetaScope:
    def test_meta_declines_out_of_scope(self):
        # header meta must use the SAME scope gate as the raster path
        from suckit_ray.stages.media import _image_meta_native

        gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # transparent
        assert _image_meta_native(_gif(2, 2, CODES_0110, extensions=gce)) is None
        frame2 = (
            b"\x2c" + (0).to_bytes(2, "little") * 2
            + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + b"\x00\x02" + _subblocks(_pack_lsb(CODES_0110))
        )
        assert (
            _image_meta_native(_gif(2, 2, CODES_0110, extra_frames=frame2))
            is None
        )
        assert (
            _image_meta_native(
                _gif(4, 4, CODES_0110, descriptor=(0, 0, 2, 2))
            )
            is None
        )
        assert _image_meta_native(_gif(2, 2, CODES_0110, gct=False)) is None
        # in-scope still returns native meta
        m = _image_meta_native(_gif(2, 2, CODES_0110))
        assert m and m["channels"] == 3 and m["format"] == "gif"
