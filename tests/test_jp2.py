"""JPEG 2000 reader: bit-exact parity against OpenJPEG (via Pillow),
GeoJP2 georeferencing, and Sentinel-2 SAFE granule assembly.

The reference ingests JP2 through GDAL (reference io.py:283-284); our
decoder is from scratch (nd_tpu/io/jp2.py), so OpenJPEG is a true
independent oracle.
"""

import os
import struct

import numpy as np
import pytest

from nd_tpu.io.jp2 import decode_jp2, Jp2Error

PIL = pytest.importorskip('PIL.Image')
from PIL import features  # noqa: E402

pytestmark = pytest.mark.skipif(
    not features.check('jpg_2000'),
    reason='Pillow lacks OpenJPEG (the oracle encoder)')


def _save(tmp_path, arr, name='t.jp2', **kw):
    p = str(tmp_path / name)
    PIL.fromarray(arr).save(p, irreversible=False, **kw)
    return p


@pytest.mark.parametrize('shape,kw', [
    ((48, 64), {}),
    ((47, 61), {}),                          # odd extents
    ((129, 131), {'codeblock_size': (32, 32)}),
    ((100, 90), {'tile_size': (32, 32)}),    # multi-tile
    ((64, 64), {'quality_layers': [50, 20, 0]}),   # multi-layer
    ((33, 40), {'num_resolutions': 1}),      # no DWT
    ((33, 40), {'num_resolutions': 3}),
])
def test_gray_bit_exact(tmp_path, shape, kw):
    rng = np.random.RandomState(hash(str(shape) + str(kw)) % 2**31)
    a = rng.randint(0, 256, shape, dtype=np.uint8)
    out = decode_jp2(_save(tmp_path, a, **kw))
    np.testing.assert_array_equal(out, a)


def test_rgb_rct_bit_exact(tmp_path):
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    out = decode_jp2(_save(tmp_path, a))
    np.testing.assert_array_equal(out, a)


def test_uint16_bit_exact(tmp_path):
    rng = np.random.RandomState(4)
    a = rng.randint(0, 65536, (40, 48), dtype=np.uint16)
    p = str(tmp_path / 't16.jp2')
    PIL.fromarray(a).save(p, irreversible=False)
    out = decode_jp2(p)
    np.testing.assert_array_equal(out, a)


def test_structured_content(tmp_path):
    # smooth + constant content exercises run-length cleanup coding
    grad = (np.add.outer(np.arange(64), np.arange(80)) % 256) \
        .astype(np.uint8)
    np.testing.assert_array_equal(decode_jp2(_save(tmp_path, grad)),
                                  grad)
    const = np.full((33, 65), 77, np.uint8)
    np.testing.assert_array_equal(decode_jp2(_save(tmp_path, const)),
                                  const)


def _psnr(a, b, peak=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak ** 2 / mse) if mse else np.inf


def _smooth(shape, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
    return (128 + 80 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
            + rng.normal(0, 6, shape)).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize('seed,shape,kw', [
    (11, (96, 112), {}),
    (12, (95, 113), {}),                      # odd extents
    (13, (96, 112), {'tile_size': (32, 32)}),  # multi-tile
    (14, (96, 112), {'num_resolutions': 3}),
    (15, (96, 112), {'quality_layers': [60, 35]}),    # truncated
    (16, (96, 112), {'quality_mode': 'rates',
                     'quality_layers': [20]}),
])
def test_irreversible_97_psnr_parity(tmp_path, seed, shape, kw):
    """The 9/7 profile decodes to PSNR parity with OpenJPEG's own
    decode of the same file: >= 45 dB agreement (observed 56-84 dB —
    float rounding at quantizer bin boundaries) and the same
    distance from the source to within 0.1 dB."""
    a = _smooth(shape, seed=seed)
    p = str(tmp_path / 'lossy.jp2')
    PIL.fromarray(a).save(p, irreversible=True, **kw)
    oracle = np.asarray(PIL.open(p))
    mine = decode_jp2(p)
    assert mine.shape == oracle.shape
    assert _psnr(mine, oracle) >= 45.0, kw
    assert abs(_psnr(mine, a) - _psnr(oracle, a)) < 0.1, kw


def test_irreversible_97_rgb_ict(tmp_path):
    a = _smooth((96, 112), seed=2)
    rgb = np.stack([a, np.roll(a, 7, 0), 255 - a], axis=-1)
    p = str(tmp_path / 'lossy_rgb.jp2')
    PIL.fromarray(rgb).save(p, irreversible=True)
    oracle = np.asarray(PIL.open(p))
    mine = decode_jp2(p)
    assert _psnr(mine, oracle) >= 45.0
    assert abs(_psnr(mine, rgb) - _psnr(oracle, rgb)) < 0.1


def test_raw_codestream(tmp_path):
    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, (30, 34), dtype=np.uint8)
    p = str(tmp_path / 't.j2k')
    PIL.fromarray(a).save(p, irreversible=False)
    np.testing.assert_array_equal(decode_jp2(p), a)


def _wrap_geojp2(plain_jp2, geotiff_payload):
    """Splice a GeoJP2 uuid box (GeoTIFF payload) into a JP2 file,
    right before the codestream box."""
    with open(plain_jp2, 'rb') as fh:
        buf = fh.read()
    uuid = bytes([0xb1, 0x4b, 0xf8, 0xbd, 0x08, 0x3d, 0x4b, 0x43,
                  0xa5, 0xae, 0x8c, 0xd7, 0xd5, 0xa6, 0xce, 0x03])
    box = struct.pack('>I', 8 + 16 + len(geotiff_payload)) + b'uuid' \
        + uuid + geotiff_payload
    # insert before jp2c
    pos = 0
    while pos + 8 <= len(buf):
        (lbox,) = struct.unpack('>I', buf[pos:pos + 4])
        tbox = buf[pos + 4:pos + 8]
        if lbox == 0:
            lbox = len(buf) - pos
        if tbox == b'jp2c':
            return buf[:pos] + box + buf[pos:]
        pos += lbox
    raise AssertionError('no jp2c box')


def test_geojp2_georeferencing(tmp_path):
    from nd_tpu.io import open_rasterio
    from nd_tpu.io.geotiff import write_geotiff
    from nd_tpu.crs import Affine, CRS

    rng = np.random.RandomState(6)
    a = rng.randint(0, 256, (24, 32), dtype=np.uint8)
    plain = _save(tmp_path, a, name='geo.jp2')
    # degenerate GeoTIFF carrying the grid
    tform = Affine(10.0, 0.0, 600000.0, 0.0, -10.0, 5900040.0)
    gt = str(tmp_path / 'carrier.tif')
    write_geotiff(gt, np.zeros((1, 1, 1), np.uint8), transform=tform,
                  crs=CRS.from_epsg(32633))
    with open(gt, 'rb') as fh:
        payload = fh.read()
    out_path = str(tmp_path / 'withgeo.jp2')
    with open(out_path, 'wb') as fh:
        fh.write(_wrap_geojp2(plain, payload))

    da = open_rasterio(out_path)
    np.testing.assert_array_equal(np.asarray(da.values)[0], a)
    assert tuple(np.round(da.attrs['transform'], 6)) == \
        (10.0, 0.0, 600000.0, 0.0, -10.0, 5900040.0)
    assert '32633' in str(da.attrs.get('crs', '')) or \
        'utm' in str(da.attrs.get('crs', ''))
    # pixel-center coords
    assert abs(float(np.asarray(da['x'].values)[0]) - 600005.0) < 1e-6


def test_open_dataset_dispatches_jp2(tmp_path):
    from nd_tpu.io import open_dataset
    rng = np.random.RandomState(8)
    a = rng.randint(0, 256, (16, 20), dtype=np.uint8)
    p = _save(tmp_path, a, name='d.jp2')
    da = open_dataset(p)
    np.testing.assert_array_equal(np.asarray(da.values)[0], a)


_MTD_TL = """<?xml version="1.0" encoding="UTF-8"?>
<n1:Level-1C_Tile_ID xmlns:n1="https://psd-14.sentinel2.eo.esa.int/\
PSD/S2_PDI_Level-1C_Tile_Metadata.xsd">
 <n1:Geometric_Info>
  <Tile_Geocoding metadataLevel="Brief">
   <HORIZONTAL_CS_NAME>WGS84 / UTM zone 33N</HORIZONTAL_CS_NAME>
   <HORIZONTAL_CS_CODE>EPSG:32633</HORIZONTAL_CS_CODE>
   <Size resolution="10"><NROWS>24</NROWS><NCOLS>32</NCOLS></Size>
   <Size resolution="20"><NROWS>12</NROWS><NCOLS>16</NCOLS></Size>
   <Geoposition resolution="10">
    <ULX>600000</ULX><ULY>5900040</ULY>
    <XDIM>10</XDIM><YDIM>-10</YDIM>
   </Geoposition>
   <Geoposition resolution="20">
    <ULX>600000</ULX><ULY>5900040</ULY>
    <XDIM>20</XDIM><YDIM>-20</YDIM>
   </Geoposition>
  </Tile_Geocoding>
 </n1:Geometric_Info>
</n1:Level-1C_Tile_ID>
"""


def test_sentinel2_safe_granule(tmp_path):
    from nd_tpu.io import open_sentinel2_granule

    gdir = tmp_path / 'L1C_T33UUP_A012345_20250101T101049'
    (gdir / 'IMG_DATA').mkdir(parents=True)
    (gdir / 'MTD_TL.xml').write_text(_MTD_TL)
    rng = np.random.RandomState(9)
    bands10 = {}
    for b in ('B02', 'B03', 'B04'):
        a = rng.randint(0, 4096, (24, 32), dtype=np.uint16)
        bands10[b] = a
        PIL.fromarray(a).save(
            str(gdir / 'IMG_DATA' /
                ('T33UUP_20250101T101049_%s.jp2' % b)),
            irreversible=False)
    # one 20 m band that must be excluded from the 10 m grid
    a20 = rng.randint(0, 4096, (12, 16), dtype=np.uint16)
    PIL.fromarray(a20).save(
        str(gdir / 'IMG_DATA' / 'T33UUP_20250101T101049_B11.jp2'),
        irreversible=False)

    ds = open_sentinel2_granule(str(gdir))
    assert set(ds.data_vars) == {'B02', 'B03', 'B04'}
    for b, a in bands10.items():
        np.testing.assert_array_equal(np.asarray(ds[b].values), a)
    x = np.asarray(ds['x'].values)
    y = np.asarray(ds['y'].values)
    assert x[0] == 600005.0 and y[0] == 5900035.0
    assert '33' in ds.attrs['crs']
    # the 20 m grid loads on request
    ds20 = open_sentinel2_granule(str(gdir), resolution=20)
    assert set(ds20.data_vars) == {'B11'}
    np.testing.assert_array_equal(np.asarray(ds20['B11'].values), a20)
    # unknown resolution is a loud error
    with pytest.raises(ValueError):
        open_sentinel2_granule(str(gdir), resolution=60)
    # dyadic overview: half-resolution decode with a scaled grid,
    # bit-exact vs OpenJPEG's own reduced decode of each band
    ov = open_sentinel2_granule(str(gdir), overview_level=0)
    assert set(ov.data_vars) == {'B02', 'B03', 'B04'}
    for b in ('B02', 'B03', 'B04'):
        img = PIL.open(str(gdir / 'IMG_DATA' /
                           ('T33UUP_20250101T101049_%s.jp2' % b)))
        img.reduce = 1
        np.testing.assert_array_equal(np.asarray(ov[b].values),
                                      np.asarray(img))
    assert np.asarray(ov['x'].values)[0] == 600010.0   # 20 m centers
    assert ov.attrs['res'] == (20.0, 20.0)


def test_derived_quantization_deltas(tmp_path):
    """Sqcd style 1 (scalar derived): one (exponent, mantissa) pair
    derives every band's step as eps_b = eps0 - (r - 1) per Annex E
    E-5. Pillow's encoder always writes expounded, so the derived
    wiring is pinned by rewriting a parsed codestream's QCD and
    checking each band's delta against the literal formula."""
    from nd_tpu.io import jp2 as J

    a = _smooth((48, 48), seed=21)
    p = str(tmp_path / 'l.jp2')
    PIL.fromarray(a).save(p, irreversible=True, num_resolutions=4)
    buf = open(p, 'rb').read()
    cs = J._parse_markers(buf[buf.find(b'\xff\x4f\xff\x51'):])
    eps0, mu0, guard = 12, 1536, 2
    cs.qcd = {'style': 1, 'guard': guard, 'exps': [eps0],
              'mants': [mu0]}
    cs.qcc = {}
    tile, _ = J._build_tile(cs, 0)
    prec = cs.comps[0]['prec']
    gains = {'LL': 0, 'HL': 1, 'LH': 1, 'HH': 2}
    checked = 0
    for r, res in enumerate(tile['comps'][0]['resolutions']):
        eps_b = eps0 - (r - 1 if r else 0)
        for band in res['bands']:
            want = 2.0 ** (prec + gains[band.otype] - eps_b) \
                * (1.0 + mu0 / 2048.0)
            assert band.delta == want, (r, band.otype)
            assert band.mb == eps_b + guard - 1, (r, band.otype)
            checked += 1
    assert checked == 1 + 3 * 3


@pytest.mark.parametrize('reduce', [1, 2, 3])
def test_reduced_resolution_decode_bit_exact(tmp_path, reduce):
    """reduce= stops the DWT synthesis early (the pyramid IS the
    overview chain) — bit-exact against OpenJPEG's own reduced decode
    (Pillow's Jpeg2KImageFile.reduce)."""
    a = _smooth((96, 112), seed=4)
    p = str(tmp_path / 'r.jp2')
    PIL.fromarray(a).save(p, irreversible=False)
    img = PIL.open(p)
    img.reduce = reduce
    oracle = np.asarray(img)
    mine = decode_jp2(p, reduce=reduce)
    np.testing.assert_array_equal(mine, oracle)


def test_reduced_resolution_decode_lossy_and_tiled(tmp_path):
    a = _smooth((95, 113), seed=5)
    p = str(tmp_path / 'r2.jp2')
    PIL.fromarray(a).save(p, irreversible=True, tile_size=(32, 32))
    img = PIL.open(p)
    img.reduce = 1
    oracle = np.asarray(img).astype(int)
    mine = decode_jp2(p, reduce=1).astype(int)
    assert mine.shape == oracle.shape == (48, 57)
    assert np.abs(mine - oracle).max() <= 2    # f32-vs-f64 rounding
    with pytest.raises(ValueError, match='reduce'):
        decode_jp2(p, reduce=9)


def test_open_rasterio_jp2_overview_level(tmp_path):
    """overview_level decodes the dyadic overview and scales the
    transform like the GeoTIFF reader."""
    from nd_tpu.io import open_rasterio
    a = _smooth((64, 64), seed=6)
    p = str(tmp_path / 'ov.jp2')
    PIL.fromarray(a).save(p, irreversible=False)
    # world file georeferencing
    with open(str(tmp_path / 'ov.j2w'), 'w') as fh:
        fh.write('10.0\n0.0\n0.0\n-10.0\n600005.0\n5900035.0\n')
    full = open_rasterio(p)
    half = open_rasterio(p, overview_level=0)
    assert half.shape == (1, 32, 32)
    t0 = np.asarray(full.attrs['transform'], float)
    t1 = np.asarray(half.attrs['transform'], float)
    assert t1[0] == 2 * t0[0] and t1[4] == 2 * t0[4]
    assert t1[2] == t0[2] and t1[5] == t0[5]
    # pixel centers: first reduced center = origin + half a (big) px
    assert abs(float(np.asarray(half['x'].values)[0])
               - (600000.0 + 10.0)) < 1e-6


def test_native_t1_matches_python(tmp_path, monkeypatch):
    """The C++ Tier-1 decoder is a bit-exact twin of the Python
    specification: full decodes of lossless AND truncated-lossy
    fixtures agree coefficient-for-coefficient (the decoded images
    match bitwise, incl. the lastp-driven 9/7 reconstruction)."""
    from nd_tpu._native import available
    if not available():
        pytest.skip('native toolchain unavailable')
    from nd_tpu.io import jp2 as J

    rng = np.random.RandomState(33)
    fixtures = []
    a = rng.randint(0, 256, (80, 96), np.uint8)
    p1 = str(tmp_path / 'n1.jp2')
    PIL.fromarray(a).save(p1, irreversible=False)
    fixtures.append(p1)
    b = _smooth((95, 77), seed=34)
    p2 = str(tmp_path / 'n2.jp2')
    PIL.fromarray(b).save(p2, irreversible=True,
                          quality_layers=[50, 30])
    fixtures.append(p2)
    for p in fixtures:
        monkeypatch.setattr(J, '_NATIVE_T1', None)
        monkeypatch.setenv('ND_TPU_JP2_NATIVE', '1')
        native = J.decode_jp2(p)
        monkeypatch.setattr(J, '_NATIVE_T1', None)
        monkeypatch.setenv('ND_TPU_JP2_NATIVE', '0')
        python = J.decode_jp2(p)
        monkeypatch.setattr(J, '_NATIVE_T1', None)
        np.testing.assert_array_equal(native, python, err_msg=p)
