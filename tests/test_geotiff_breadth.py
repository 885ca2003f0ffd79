"""GeoTIFF reader/writer breadth added in round 2 (VERDICT item 8):
BigTIFF containers, floating-point predictor 3, JPEG + ZSTD codecs
(import-gated), tiled-TIFF write."""

import os
import struct
import tempfile
import zlib

import numpy as np
import pytest

from nd_tpu.io.geotiff import TiffFile, write_geotiff


def _classic_tiff(entries_vals, blocks):
    """Assemble a minimal little-endian classic TIFF.

    entries_vals: list of (tag, type, [values]); blocks: list of raw
    strip/tile byte strings referenced by offset tags already included
    in entries_vals as placeholders (resolved here, tag 273 or 324).
    """
    bo = '<'
    entries = []
    extra = bytearray()

    tag_sizes = {3: ('H', 2), 4: ('I', 4), 7: ('B', 1), 12: ('d', 8)}

    def emit(tag, typ, values):
        fmt, sz = tag_sizes[typ]
        packed = struct.pack(bo + fmt * len(values), *values)
        if len(packed) <= 4:
            entries.append((tag, typ, len(values),
                            packed + b'\0' * (4 - len(packed))))
        else:
            entries.append((tag, typ, len(values),
                            ('extra', len(extra))))
            extra.extend(packed)

    for tag, typ, vals in sorted(entries_vals):
        emit(tag, typ, list(vals))

    header = 8
    ifd_size = 2 + len(entries) * 12 + 4
    extra_off = header + ifd_size
    data_off = extra_off + len(extra)

    # resolve the block-offset tag (273 strips / 324 tiles)
    offsets = []
    pos = data_off
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if tag in (273, 324):
            packed = struct.pack(bo + 'I' * len(offsets), *offsets)
            if len(packed) <= 4:
                entries[i] = (tag, typ, cnt,
                              packed + b'\0' * (4 - len(packed)))
            else:
                entries[i] = (tag, typ, cnt, ('extra', len(extra)))
                extra.extend(packed)
                # extra grew: every offset shifts by the growth
                shift = extra_off + len(extra) - data_off
                offsets = [o + shift for o in offsets]
                struct.pack_into(bo + 'I' * len(offsets), extra,
                                 len(extra) - 4 * len(offsets),
                                 *offsets)
                data_off = extra_off + len(extra)

    out = bytearray()
    out += b'II*\0' + struct.pack(bo + 'I', 8)
    out += struct.pack(bo + 'H', len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + 'HHI', tag, typ, cnt)
        out += struct.pack(bo + 'I', extra_off + val[1]) \
            if isinstance(val, tuple) else val
    out += struct.pack(bo + 'I', 0)
    out += bytes(extra)
    for b in blocks:
        out += b
    return bytes(out)


def test_bigtiff_read(tmp_path):
    """Hand-assembled minimal BigTIFF: 8-byte offsets, 20-byte IFD
    entries."""
    img = np.arange(30, dtype=np.uint16).reshape(5, 6)
    raw = img.astype('<u2').tobytes()
    bo = '<'
    # header: II, 43, offsetsize 8, 0, ifd offset (Q)
    header = b'II' + struct.pack(bo + 'HHHQ', 43, 8, 0, 16)
    fields = [
        (256, 3, [6]), (257, 3, [5]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (277, 3, [1]), (278, 4, [5]),
        (279, 4, [len(raw)]), (339, 3, [1]),
    ]
    n = len(fields) + 1
    ifd_size = 8 + 20 * n + 8
    data_off = 16 + ifd_size
    fields.append((273, 16, [data_off]))      # type 16 = TIFF_LONG8
    fields.sort()
    body = struct.pack(bo + 'Q', n)
    fmts = {3: 'H', 4: 'I', 16: 'Q'}
    for tag, typ, vals in fields:
        packed = struct.pack(bo + fmts[typ] * len(vals), *vals)
        body += struct.pack(bo + 'HHQ', tag, typ, len(vals))
        body += packed + b'\0' * (8 - len(packed))
    body += struct.pack(bo + 'Q', 0)
    path = str(tmp_path / 'big.tif')
    with open(path, 'wb') as fh:
        fh.write(header + body + raw)

    with TiffFile(path) as t:
        assert t.bigtiff
        out = t.read()
    np.testing.assert_array_equal(out[0], img)


def _fp3_encode_rows(band):
    """Reference encoder for TIFF predictor 3 (single sample/px):
    per row, big-endian bytes shuffled plane-major then byte-diffed."""
    h, w = band.shape
    itemsize = band.dtype.itemsize
    be = band.astype(band.dtype.newbyteorder('>'))
    rows = []
    for r in range(h):
        by = np.frombuffer(be[r].tobytes(), np.uint8)
        planes = by.reshape(w, itemsize).T.copy().reshape(-1)
        diffed = planes.copy()
        diffed[1:] = planes[1:] - planes[:-1]
        rows.append(diffed.tobytes())
    return b''.join(rows)


def test_float_predictor3_decodes(tmp_path):
    rng = np.random.RandomState(3)
    img = (rng.rand(7, 9).astype(np.float32) * 100 - 50)
    payload = zlib.compress(_fp3_encode_rows(img))
    data = _classic_tiff(
        [(256, 4, [9]), (257, 4, [7]), (258, 3, [32]), (259, 3, [8]),
         (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [7]),
         (279, 4, [len(payload)]), (317, 3, [3]), (339, 3, [3])],
        [payload])
    path = str(tmp_path / 'p3.tif')
    with open(path, 'wb') as fh:
        fh.write(data)
    with TiffFile(path) as t:
        out = t.read()
    np.testing.assert_array_equal(out[0], img)


def test_jpeg_tiff_decodes(tmp_path):
    cv2 = pytest.importorskip('cv2')
    rng = np.random.RandomState(1)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.rand(32, 48) * 255, 4).astype(np.uint8)
    ok, enc = cv2.imencode('.jpg', img,
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    payload = enc.tobytes()
    data = _classic_tiff(
        [(256, 4, [48]), (257, 4, [32]), (258, 3, [8]), (259, 3, [7]),
         (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [32]),
         (279, 4, [len(payload)]), (339, 3, [1])],
        [payload])
    path = str(tmp_path / 'jp.tif')
    with open(path, 'wb') as fh:
        fh.write(data)
    with TiffFile(path) as t:
        out = t.read()
    assert out.shape == (1, 32, 48)
    # lossy codec: smooth content survives within a few counts
    assert np.abs(out[0].astype(int) - img.astype(int)).mean() < 3


def test_zstd_gated_error(tmp_path):
    payload = b'\x28\xb5\x2f\xfd bogus'
    data = _classic_tiff(
        [(256, 4, [4]), (257, 4, [4]), (258, 3, [8]),
         (259, 3, [50000]), (262, 3, [1]), (273, 4, [0]),
         (277, 3, [1]), (278, 4, [4]), (279, 4, [len(payload)]),
         (339, 3, [1])],
        [payload])
    path = str(tmp_path / 'z.tif')
    with open(path, 'wb') as fh:
        fh.write(data)
    try:
        import zstandard  # noqa: F401
        have = True
    except ImportError:
        have = False
    with TiffFile(path) as t:
        with pytest.raises(Exception) as exc:
            t.read()
    if not have:
        assert 'zstandard' in str(exc.value)


@pytest.mark.parametrize('shape,dtype', [
    ((70, 90), np.float32),
    ((3, 33, 47), np.uint16),
    ((64, 64), np.int32),
])
def test_tiled_write_roundtrip(tmp_path, shape, dtype):
    rng = np.random.RandomState(0)
    img = (rng.rand(*shape) * 100).astype(dtype)
    path = str(tmp_path / 'tiled.tif')
    write_geotiff(path, img, tiled=True, tile_size=32)
    with TiffFile(path) as t:
        assert 322 in t.tags and 324 in t.tags
        assert t.tags[322][0] % 16 == 0
        out = t.read()
    expect = img[None] if img.ndim == 2 else img
    np.testing.assert_array_equal(out, expect)


def test_tiled_write_with_geo_roundtrip(tmp_path):
    from nd_tpu.crs import Affine
    img = np.arange(40 * 50, dtype=np.float32).reshape(40, 50)
    path = str(tmp_path / 'geo.tif')
    write_geotiff(path, img, transform=Affine(10, 0, 5, 0, -10, 995),
                  crs='epsg:32633', tiled=True, tile_size=16)
    with TiffFile(path) as t:
        out = t.read()
        assert t.crs is not None and t.crs.to_epsg() == 32633
        assert tuple(t.transform)[:6] == (10, 0, 5, 0, -10, 995)
    np.testing.assert_array_equal(out[0], img)


# ---------------------------------------------------------------------------
# overview pyramids (reduced-resolution IFD chain, the COG layout)
# ---------------------------------------------------------------------------

def test_overview_roundtrip_float_average():
    from nd_tpu.io.geotiff import _decimate
    rng = np.random.RandomState(0)
    data = (rng.rand(2, 130, 97) * 10).astype(np.float32)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'ov.tif')
        write_geotiff(path, data, tiled=True, tile_size=32,
                      overviews=[2, 4])
        with TiffFile(path) as t:
            np.testing.assert_array_equal(t.read(), data)
            assert t.overviews == [(49, 65), (25, 33)]
            np.testing.assert_allclose(t.read_overview(0),
                                       _decimate(data, 2), rtol=1e-6)
            np.testing.assert_allclose(t.read_overview(1),
                                       _decimate(data, 4), rtol=1e-6)


def test_overview_int_nearest_and_auto_factors():
    rng = np.random.RandomState(1)
    data = rng.randint(0, 255, size=(1, 600, 520)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'ovi.tif')
        write_geotiff(path, data, overviews=True)
        with TiffFile(path) as t:
            np.testing.assert_array_equal(t.read(), data)
            assert t.overviews == [(260, 300)]   # 520x600 // 2
            np.testing.assert_array_equal(t.read_overview(0),
                                          data[:, ::2, ::2])


def test_overview_absent_and_bad_level():
    data = np.zeros((1, 8, 8), np.float32)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'plain.tif')
        write_geotiff(path, data)
        with TiffFile(path) as t:
            assert t.overviews == []
            with pytest.raises(IndexError):
                t.read_overview(0)

def test_overview_factor_validation():
    with pytest.raises(ValueError):
        write_geotiff('/tmp/never.tif', np.zeros((4, 4), np.float32),
                      overviews=[1])


def test_overview_nan_average():
    """NaN pixels are excluded from the block average, like GDAL."""
    data = np.full((1, 4, 4), np.nan, np.float32)
    data[0, 0, 0] = 4.0
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'nan.tif')
        write_geotiff(path, data, overviews=[2])
        with TiffFile(path) as t:
            ov = t.read_overview(0)
    assert ov[0, 0, 0] == 4.0       # sole finite sample survives
    assert np.isnan(ov[0, 1, 1])


def test_open_rasterio_overview_level():
    from nd_tpu.crs import Affine
    from nd_tpu.io import open_rasterio
    rng = np.random.RandomState(5)
    data = (rng.rand(1, 200, 160) * 10).astype(np.float32)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'ov.tif')
        write_geotiff(path, data, tiled=True, tile_size=64,
                      overviews=[2, 4],
                      transform=Affine(0.01, 0, 10.0, 0, -0.01, 50.0),
                      crs='epsg:4326')
        full = open_rasterio(path)
        ov = open_rasterio(path, overview_level=0)
    assert dict(ov.sizes) == {'band': 1, 'y': 100, 'x': 80}
    assert ov.attrs['res'] == (0.02, 0.02)
    # pixel centers shift by half a source pixel at 2x decimation
    assert abs(float(ov._coords['x'].values[0]) - 10.01) < 1e-9
    assert abs(float(full._coords['x'].values[0]) - 10.005) < 1e-9


@pytest.mark.parametrize('seed', range(8))
def test_fuzz_windowed_reads_match_full(seed):
    """Random layouts x random windows: read_window must equal the
    corresponding slice of the full decode."""
    rng = np.random.RandomState(seed)
    nb = rng.randint(1, 4)
    h = rng.randint(5, 120)
    w = rng.randint(5, 120)
    dtype = rng.choice([np.uint8, np.int16, np.float32, np.float64])
    data = (rng.rand(nb, h, w) * 200).astype(dtype)
    tiled = bool(rng.randint(2))
    kw = {'compress': bool(rng.randint(2))}
    if tiled:
        kw.update(tiled=True,
                  tile_size=int(rng.choice([16, 32, 48])))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'f.tif')
        write_geotiff(path, data, **kw)
        with TiffFile(path) as t:
            full = t.read()
            np.testing.assert_array_equal(full, data)
            for _ in range(6):
                y0 = rng.randint(0, h)
                y1 = rng.randint(y0, h + 1)
                x0 = rng.randint(0, w)
                x1 = rng.randint(x0, w + 1)
                bands = list(rng.permutation(nb)[:rng.randint(1, nb + 1)])
                win = t.read_window(bands, y0, y1, x0, x1)
                np.testing.assert_array_equal(
                    win, data[bands, y0:y1, x0:x1])


# ---------------------------------------------------------------------
# write-side codec breadth: LZW / PackBits / ZSTD / Deflate / none
# ---------------------------------------------------------------------

@pytest.mark.parametrize('codec', ['none', 'deflate', 'lzw', 'packbits',
                                   'zstd'])
@pytest.mark.parametrize('tiled', [False, True])
def test_write_codec_roundtrip(tmp_path, codec, tiled):
    if codec == 'zstd':
        pytest.importorskip('zstandard')
    rng = np.random.RandomState(7)
    # mixed content: smooth float band + RLE-friendly integer plateaus
    data = np.stack([
        np.linspace(0, 50, 70 * 90, dtype=np.float32).reshape(70, 90),
        np.repeat(rng.randint(0, 5, (70, 9)), 10, axis=1)
          .astype(np.float32),
    ])
    path = str(tmp_path / ('c_%s.tif' % codec))
    write_geotiff(path, data, compress=codec, tiled=tiled, tile_size=32)
    with TiffFile(path) as t:
        np.testing.assert_array_equal(t.read(), data)
        win = t.read_window([1], 3, 41, 5, 77)
        np.testing.assert_array_equal(win, data[1:2, 3:41, 5:77])


def test_write_lzw_crosses_code_widths_and_reset(tmp_path):
    """Random uint8 content forces the LZW table through the 9->12 bit
    widths and a dictionary reset; the stream must still decode."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (220, 600), np.uint8)
    path = str(tmp_path / 'wide.tif')
    write_geotiff(path, img, compress='lzw')
    with TiffFile(path) as t:
        np.testing.assert_array_equal(t.read()[0], img)


@pytest.mark.parametrize('codec,pil_name', [
    ('lzw', 'tiff_lzw'),
    ('packbits', 'packbits'),
    ('deflate', 'tiff_adobe_deflate'),
])
def test_write_codec_pillow_cross_decode(tmp_path, codec, pil_name):
    """Independent decoder oracle: Pillow (libtiff) must read our
    LZW/PackBits/Deflate streams bit-exactly."""
    Image = pytest.importorskip('PIL.Image')
    rng = np.random.RandomState(3)
    img = np.repeat(rng.randint(0, 200, (40, 13), np.uint8), 5, axis=1)
    img[7:11] = 255                       # runs for packbits
    path = str(tmp_path / ('x_%s.tif' % codec))
    write_geotiff(path, img, compress=codec)
    arr = np.asarray(Image.open(path))
    np.testing.assert_array_equal(arr, img)


def test_write_zstd_real_payload_roundtrip(tmp_path):
    """A genuinely ZSTD-compressed strip decodes (zstandard is present
    in this image, so the 50000 codec path executes for real)."""
    pytest.importorskip('zstandard')
    rng = np.random.RandomState(11)
    img = rng.rand(57, 123).astype(np.float64)
    path = str(tmp_path / 'z.tif')
    write_geotiff(path, img, compress='zstd', overviews=[2])
    with TiffFile(path) as t:
        np.testing.assert_array_equal(t.read()[0], img)
        assert len(t.overviews) == 1


def test_write_unknown_codec_rejected(tmp_path):
    with pytest.raises(ValueError):
        write_geotiff(str(tmp_path / 'n.tif'),
                      np.zeros((4, 4), np.float32), compress='brotli')
