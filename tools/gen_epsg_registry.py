#!/usr/bin/env python
"""Generate the data-driven EPSG registry from the system PROJ database.

Reads /usr/share/proj/proj.db (the authoritative EPSG dataset shipped
with PROJ; cf. /root/reference/nd/warp.py:71-115 which resolves any
authority code through pyproj/PROJ at runtime) and emits every
projected + geographic-2D EPSG code whose projection method, datum
path, prime meridian and axes the nd_tpu CRS engine implements, as
``nd_tpu/crs/epsg_registry.json.gz``: {code: proj4-style param dict}.

The curated table in ``nd_tpu/crs/crs.py`` keeps priority for the
codes it defines (those entries are oracle-tested); this registry
fills everything else — State Plane zones, national grids, the long
tail of UTM-on-datum families.

Selection rules:
- conversion method in the supported map below, every parameter
  decodable (9110 sexagesimal DMS handled);
- geodetic base is geographic 2D on the Greenwich prime meridian;
- datum shift resolvable: a Helmert transformation to WGS 84 (or to a
  WGS84-equivalent frame) in the EPSG data — largest-extent,
  then best-accuracy wins, Molodensky-Badekas reduced to 7-param —
  or a frame EPSG models as zero-shift;
- projected axes oriented east/north (either order; coordinates are
  always handled x=east, y=north, the GDAL/pyproj always_xy
  convention the reference relies on), with a known length unit.
"""

import gzip
import json
import math
import os
import sqlite3
import sys

DB = '/usr/share/proj/proj.db'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'nd_tpu', 'crs', 'epsg_registry.json.gz')

ARCSEC = 4.848136811095355e-06   # rad

# conversion method -> (proj id, {EPSG param code: proj4 key})
# param kinds: angle -> degrees, length -> meters, scale -> unity
METHODS = {
    9807: ('tmerc', {8801: 'lat_0', 8802: 'lon_0', 8805: 'k',
                     8806: 'x_0', 8807: 'y_0'}),
    9802: ('lcc', {8821: 'lat_0', 8822: 'lon_0', 8823: 'lat_1',
                   8824: 'lat_2', 8826: 'x_0', 8827: 'y_0'}),
    9801: ('lcc', {8801: 'lat_0', 8802: 'lon_0', 8805: 'k',
                   8806: 'x_0', 8807: 'y_0'}),   # 1SP: lat_1 = lat_0
    9820: ('laea', {8801: 'lat_0', 8802: 'lon_0', 8806: 'x_0',
                    8807: 'y_0'}),
    9822: ('aea', {8821: 'lat_0', 8822: 'lon_0', 8823: 'lat_1',
                   8824: 'lat_2', 8826: 'x_0', 8827: 'y_0'}),
    9804: ('merc', {8801: 'lat_0', 8802: 'lon_0', 8805: 'k',
                    8806: 'x_0', 8807: 'y_0'}),
    9805: ('merc', {8823: 'lat_ts', 8802: 'lon_0', 8806: 'x_0',
                    8807: 'y_0'}),
    1024: ('webmerc', {8801: 'lat_0', 8802: 'lon_0', 8806: 'x_0',
                       8807: 'y_0'}),
    9809: ('sterea', {8801: 'lat_0', 8802: 'lon_0', 8805: 'k',
                      8806: 'x_0', 8807: 'y_0'}),
    9810: ('stere', {8801: 'lat_0', 8802: 'lon_0', 8805: 'k',
                     8806: 'x_0', 8807: 'y_0'}),
    9829: ('stere', {8832: 'lat_ts', 8833: 'lon_0', 8806: 'x_0',
                     8807: 'y_0'}),              # lat_0 from lat_ts sign
    9815: ('omerc', {8811: 'lat_0', 8812: 'lonc', 8813: 'alpha',
                     8814: 'gamma', 8815: 'k', 8816: 'x_0',
                     8817: 'y_0'}),
    9812: ('omerc', {8811: 'lat_0', 8812: 'lonc', 8813: 'alpha',
                     8814: 'gamma', 8815: 'k', 8806: 'x_0',
                     8807: 'y_0'}),              # variant A: no_uoff
    1041: ('krovak', {8811: 'lat_0', 8833: 'lon_0', 1036: 'alpha',
                      8818: 'lat_1', 8819: 'k', 8806: 'x_0',
                      8807: 'y_0'}),             # north-orientated
    9835: ('cea', {8823: 'lat_ts', 8802: 'lon_0', 8806: 'x_0',
                   8807: 'y_0'}),
    1078: ('eqearth', {8802: 'lon_0', 8806: 'x_0', 8807: 'y_0'}),
    9840: ('ortho', {8801: 'lat_0', 8802: 'lon_0', 8806: 'x_0',
                     8807: 'y_0'}),
}

# Helmert method families (sign convention: position vector)
HELMERT_3 = {9603, 1031, 1035}
HELMERT_PV = {9606, 1033, 1037}
HELMERT_CF = {9607, 1032, 1038}
HELMERT_MB_PV = {1063, 1061}     # Molodensky-Badekas PV variants
HELMERT_MB_CF = {9636, 1034}     # Molodensky-Badekas CF variants

# frames EPSG-equivalent to WGS 84 at raster accuracy (the engine's
# datum model is a single Helmert to WGS 84; these geographic CRS are
# accepted as transformation *targets* with zero residual shift)
WGS84_FRAMES = {4326, 4258, 4269, 4152, 4759, 6318, 4617, 4283, 7844,
                4151, 4148, 4173, 4612, 6668, 4674, 4190, 9777, 9782,
                8999, 7931, 9989, 4957, 4171}

# engine-named ellipsoids: name -> (a, rf or None, b or None)
ENGINE_ELLPS = {
    'WGS84': (6378137.0, 298.257223563, None),
    'GRS80': (6378137.0, 298.257222101, None),
    'airy': (6377563.396, None, 6356256.909),
    'mod_airy': (6377340.189, None, 6356034.446),
    'intl': (6378388.0, 297.0, None),
    'clrk66': (6378206.4, None, 6356583.8),
    'bessel': (6377397.155, 299.1528128, None),
    'krass': (6378245.0, 298.3, None),
    'GRS67': (6378160.0, 298.247167427, None),
    'aust_SA': (6378160.0, 298.25, None),
    'clrk80': (6378249.145, 293.4663, None),
    'clrk80ign': (6378249.2, 293.4660212936, None),
    'evrst30': (6377276.345, 300.8017, None),
    'evrstSS': (6377298.556, 300.8017, None),
    'WGS72': (6378135.0, 298.26, None),
    'helmert': (6378200.0, 298.3, None),
}


def dms_to_deg(v):
    """EPSG 9110 sexagesimal DMS: DDD.MMSSsss -> decimal degrees."""
    sign = -1.0 if v < 0 else 1.0
    v = abs(float(v))
    deg = math.floor(v + 1e-12)
    frac = '%.9f' % (v - deg)
    digits = frac.split('.')[1]
    mm = int(digits[0:2] or 0)
    ss = int(digits[2:4] or 0)
    ss_frac = digits[4:]
    seconds = ss + (int(ss_frac) / 10.0 ** len(ss_frac)
                    if ss_frac.strip('0') else 0.0)
    return sign * (deg + mm / 60.0 + seconds / 3600.0)


class Gen:
    def __init__(self, db_path=DB):
        self.db = sqlite3.connect(db_path)
        self.cur = self.db.cursor()
        self.uom = {}
        for code, typ, factor in self.cur.execute(
                "SELECT code, type, conv_factor FROM unit_of_measure "
                "WHERE auth_name='EPSG'"):
            self.uom[code] = (typ, factor)
        self.skip_stats = {}

    def skip(self, why):
        self.skip_stats[why] = self.skip_stats.get(why, 0) + 1
        return None

    def angle(self, value, uom):
        typ, factor = self.uom[uom]
        if typ != 'angle':
            raise ValueError('not an angle uom %d' % uom)
        if uom == 9110:
            return dms_to_deg(value)
        if factor is None:
            raise ValueError('angle uom %d lacks factor' % uom)
        return float(value) * factor * 180.0 / math.pi

    def length_m(self, value, uom):
        typ, factor = self.uom[uom]
        if typ != 'length' or factor is None:
            raise ValueError('bad length uom %d' % uom)
        return float(value) * factor

    def scale(self, value, uom):
        typ, factor = self.uom[uom]
        if typ != 'scale' or factor is None:
            raise ValueError('bad scale uom %d' % uom)
        return float(value) * factor

    # -- ellipsoid -------------------------------------------------------
    def ellipsoid_params(self, code):
        row = self.cur.execute(
            "SELECT semi_major_axis, inv_flattening, semi_minor_axis,"
            " uom_auth_name, uom_code FROM ellipsoid "
            "WHERE auth_name='EPSG' AND code=?", (code,)).fetchone()
        if row is None:
            return None
        a, rf, b, _, uom = row
        a = self.length_m(a, uom)
        if b is not None:
            b = self.length_m(b, uom)
        for name, (ea, erf, eb) in ENGINE_ELLPS.items():
            if abs(ea - a) < 1e-4:
                if rf is not None and erf is not None \
                        and abs(rf - erf) < 1e-7:
                    return {'ellps': name}
                if b is not None and eb is not None \
                        and abs(b - eb) < 1e-4:
                    return {'ellps': name}
        out = {'a': a}
        if rf is not None:
            out['rf'] = float(rf)
        elif b is not None:
            out['b'] = b
        else:
            out['b'] = a                 # sphere
        return out

    # -- datum shift -----------------------------------------------------
    def _extent_area(self, auth, code):
        row = self.cur.execute(
            "SELECT south_lat, north_lat, west_lon, east_lon FROM "
            "extent WHERE auth_name=? AND code=?", (auth, code)
        ).fetchone()
        if row is None or any(v is None for v in row):
            return 0.0
        s, n, w, e = row
        if e < w:
            e += 360.0
        return max(0.0, (n - s)) * max(0.0, (e - w))

    def towgs84(self, geo_code):
        """Best Helmert 7-tuple (position-vector, m/arcsec/ppm) from
        the geographic CRS to a WGS84-equivalent frame, or None."""
        if geo_code in WGS84_FRAMES:
            return (0.0,) * 7
        rows = self.cur.execute(
            "SELECT h.code, h.method_code, h.accuracy,"
            " h.tx, h.ty, h.tz, h.translation_uom_code,"
            " h.rx, h.ry, h.rz, h.rotation_uom_code,"
            " h.scale_difference, h.scale_difference_uom_code,"
            " h.px, h.py, h.pz, h.pivot_uom_code"
            " FROM helmert_transformation_table h"
            " WHERE h.auth_name='EPSG' AND h.deprecated=0"
            " AND h.source_crs_auth_name='EPSG'"
            " AND h.source_crs_code=?"
            " AND h.target_crs_auth_name='EPSG'"
            " AND h.target_crs_code IN (%s)"
            % ','.join(str(c) for c in sorted(WGS84_FRAMES)),
            (geo_code,)).fetchall()
        best = None
        for row in rows:
            (code, method, acc, tx, ty, tz, t_uom, rx, ry, rz, r_uom,
             ds, s_uom, px, py, pz, p_uom) = row
            if method in HELMERT_3:
                fam = '3'
            elif method in HELMERT_PV:
                fam = 'pv'
            elif method in HELMERT_CF:
                fam = 'cf'
            elif method in HELMERT_MB_PV:
                fam = 'mb_pv'
            elif method in HELMERT_MB_CF:
                fam = 'mb_cf'
            else:
                continue
            try:
                t = [self.length_m(v, t_uom) for v in (tx, ty, tz)]
                if fam == '3':
                    r = [0.0, 0.0, 0.0]
                    s = 0.0
                else:
                    _, rf = self.uom[r_uom]
                    r = [float(v) * rf / ARCSEC for v in (rx, ry, rz)]
                    s = self.scale(ds, s_uom) * 1e6   # -> ppm
                if fam in ('mb_pv', 'mb_cf'):
                    # Molodensky-Badekas -> equivalent 7-param: the
                    # pivot folds into the translation, t' = t+(I-R)p
                    p = [self.length_m(v, p_uom) for v in (px, py, pz)]
                    rr = [v * ARCSEC for v in r]          # radians
                    sc = s * 1e-6
                    if fam == 'mb_cf':
                        rr = [-v for v in rr]
                    # position-vector R p = p + omega x p + s p
                    rot = [rr[1] * p[2] - rr[2] * p[1],
                           rr[2] * p[0] - rr[0] * p[2],
                           rr[0] * p[1] - rr[1] * p[0]]
                    t = [t[i] - rot[i] - sc * p[i] for i in range(3)]
                    fam = 'pv' if fam == 'mb_pv' else 'cf'
                if fam == 'cf':
                    r = [-v for v in r]
            except Exception:
                continue
            area = 0.0
            for ea, ec in self.cur.execute(
                    "SELECT extent_auth_name, extent_code FROM usage "
                    "WHERE object_table_name="
                    "'helmert_transformation_table' AND "
                    "object_auth_name='EPSG' AND object_code=?",
                    (code,)):
                area = max(area, self._extent_area(ea, ec))
            acc = 999.0 if acc is None else float(acc)
            key = (-area, acc)
            tup = tuple(round(v, 8) for v in (t + r + [s]))
            if best is None or key < best[0]:
                best = (key, tup)
        return None if best is None else best[1]

    # -- geographic base -------------------------------------------------
    def geographic_params(self, code):
        row = self.cur.execute(
            "SELECT type, datum_auth_name, datum_code FROM "
            "geodetic_crs WHERE auth_name='EPSG' AND code=? AND "
            "deprecated=0", (code,)).fetchone()
        if row is None:
            return self.skip('geo_missing')
        typ, dauth, dcode = row
        if typ != 'geographic 2D':
            return self.skip('geo_not_2d')
        if dauth != 'EPSG':
            return self.skip('geo_datum_auth')
        drow = self.cur.execute(
            "SELECT ellipsoid_code, prime_meridian_code FROM "
            "geodetic_datum WHERE auth_name='EPSG' AND code=?",
            (dcode,)).fetchone()
        if drow is None:
            return self.skip('datum_missing')
        ell_code, pm = drow
        if pm != 8901:
            return self.skip('prime_meridian')
        ell = self.ellipsoid_params(ell_code)
        if ell is None:
            return self.skip('ellipsoid')
        shift = self.towgs84(code)
        if shift is None:
            return self.skip('no_helmert')
        out = dict(ell)
        out['towgs84'] = list(shift)
        return out

    # -- axes ------------------------------------------------------------
    def projected_axes(self, cs_code):
        rows = self.cur.execute(
            "SELECT orientation, uom_code FROM axis WHERE "
            "coordinate_system_auth_name='EPSG' AND "
            "coordinate_system_code=? ORDER BY "
            "coordinate_system_order", (cs_code,)).fetchall()
        if len(rows) != 2:
            return None
        orients = {r[0] for r in rows}
        if orients != {'east', 'north'}:
            return None
        uoms = {r[1] for r in rows}
        if len(uoms) != 1:
            return None
        uom = uoms.pop()
        typ, factor = self.uom.get(uom, (None, None))
        if typ != 'length' or factor is None:
            return None
        return factor

    # -- conversions -----------------------------------------------------
    def conversion_params(self, code):
        row = self.cur.execute(
            "SELECT * FROM conversion_table WHERE auth_name='EPSG' "
            "AND code=?", (code,)).fetchone()
        if row is None:
            return self.skip('conv_missing')
        cols = [d[0] for d in self.cur.description]
        rec = dict(zip(cols, row))
        method = rec['method_code']
        if method not in METHODS:
            return self.skip('method_%s' % method)
        proj, pmap = METHODS[method]
        out = {'proj': proj}
        for i in range(1, 8):
            pcode = rec['param%d_code' % i]
            if pcode is None:
                continue
            value = rec['param%d_value' % i]
            uom = rec['param%d_uom_code' % i]
            key = pmap.get(pcode)
            if key is None:
                return self.skip('param_%s' % pcode)
            typ = self.uom[uom][0]
            try:
                if typ == 'angle':
                    out[key] = self.angle(value, uom)
                elif typ == 'length':
                    out[key] = self.length_m(value, uom)
                else:
                    out[key] = self.scale(value, uom)
            except ValueError:
                return self.skip('uom_%s' % uom)
        if method == 9801:
            out['lat_1'] = out.get('lat_0', 0.0)
        if method == 9829:
            out['lat_0'] = 90.0 if out.get('lat_ts', 0) >= 0 else -90.0
        if method == 9812:
            out['no_uoff'] = True
        if method == 1041 and abs(out.get('lat_1', 78.5) - 78.5) > 1e-9:
            return self.skip('krovak_pseudo_parallel')
        if method == 1041:
            out.pop('lat_1', None)       # engine pins 78.5
        return out

    # -- top level -------------------------------------------------------
    def generate(self):
        table = {}
        for code, geo_code, conv_code, cs_code in self.cur.execute(
                "SELECT code, geodetic_crs_code, conversion_code, "
                "coordinate_system_code FROM projected_crs WHERE "
                "auth_name='EPSG' AND deprecated=0 AND "
                "geodetic_crs_auth_name='EPSG' AND "
                "conversion_auth_name='EPSG' AND "
                "coordinate_system_auth_name='EPSG' AND "
                "text_definition IS NULL").fetchall():
            to_meter = self.projected_axes(cs_code)
            if to_meter is None:
                self.skip('axes')
                continue
            conv = self.conversion_params(conv_code)
            if conv is None:
                continue
            geo = self.geographic_params(geo_code)
            if geo is None:
                continue
            params = dict(conv)
            params.update(geo)
            if to_meter == 1.0:
                params['units'] = 'm'
            else:
                params['to_meter'] = to_meter
            table[int(code)] = params
        for (code,) in self.cur.execute(
                "SELECT code FROM geodetic_crs WHERE auth_name='EPSG'"
                " AND deprecated=0 AND type='geographic 2D'"
        ).fetchall():
            geo = self.geographic_params(code)
            if geo is None:
                continue
            params = {'proj': 'longlat'}
            params.update(geo)
            table[int(code)] = params
        return table


def main():
    gen = Gen()
    table = gen.generate()
    payload = {str(k): v for k, v in sorted(table.items())}
    data = json.dumps(payload, separators=(',', ':'),
                      sort_keys=True).encode()
    with gzip.GzipFile(os.path.abspath(OUT), 'wb', mtime=0) as f:
        f.write(data)
    n_proj = sum(1 for p in table.values() if p['proj'] != 'longlat')
    n_geo = len(table) - n_proj
    print('wrote %s: %d entries (%d projected, %d geographic), '
          '%d KB gz' % (os.path.abspath(OUT), len(table), n_proj,
                        n_geo, os.path.getsize(os.path.abspath(OUT))
                        // 1024))
    top = sorted(gen.skip_stats.items(), key=lambda kv: -kv[1])[:15]
    print('top skip reasons:', top)
    for probe in (32145, 2263, 26917, 32633, 2154, 28355, 5070):
        print(probe, 'in table:', probe in table)


if __name__ == '__main__':
    sys.exit(main())
