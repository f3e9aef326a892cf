"""GPS <-> UTC time conversions for real-observation metadata.

The GPS timescale (epoch 1980-01-06T00:00:00 UTC = unix 315964800)
does not observe leap seconds; UTC does. The published IERS leap
history since the GPS epoch (Bulletin C — public data) gives the
GPS-UTC offset as a step function of GPS seconds. The reference gets
this mapping from mwalib/casacore; here it is a 18-entry table, enough
for any MWA observation (the array saw first light in 2013, offset 16).
"""

from __future__ import annotations

#: unix time of GPS second 0 (1980-01-06T00:00:00 UTC)
GPS_UNIX_EPOCH = 315_964_800

#: (gps_seconds_at_which_offset_takes_effect, GPS-UTC offset seconds).
#: Each entry is the leap-second insertion instant expressed in GPS
#: seconds; between entries the offset is constant. IERS Bulletin C.
_GPS_UTC_STEPS: tuple[tuple[int, int], ...] = (
    (0, 0),            # 1980-01-06
    (46828800, 1),     # 1981-07-01
    (78364801, 2),     # 1982-07-01
    (109900802, 3),    # 1983-07-01
    (173059203, 4),    # 1985-07-01
    (252028804, 5),    # 1988-01-01
    (315187205, 6),    # 1990-01-01
    (346723206, 7),    # 1991-01-01
    (393984007, 8),    # 1992-07-01
    (425520008, 9),    # 1993-07-01
    (457056009, 10),   # 1994-07-01
    (504489610, 11),   # 1996-01-01
    (551750411, 12),   # 1997-07-01
    (599184012, 13),   # 1999-01-01
    (820108813, 14),   # 2006-01-01
    (914803214, 15),   # 2009-01-01
    (1025136015, 16),  # 2012-07-01
    (1119744016, 17),  # 2015-07-01
    (1167264017, 18),  # 2017-01-01
)


def gps_utc_offset_s(gps_s: float) -> int:
    """GPS-UTC offset (leap seconds) in effect at a GPS instant."""
    off = 0
    for step, value in _GPS_UTC_STEPS:
        if gps_s >= step:
            off = value
        else:
            break
    return off


def gps_to_unix_s(gps_s: float) -> float:
    """GPS seconds -> unix (UTC) seconds, leap-corrected."""
    return GPS_UNIX_EPOCH + gps_s - gps_utc_offset_s(gps_s)


def unix_to_gps_s(unix_s: float) -> float:
    """Unix (UTC) seconds -> GPS seconds. The offset depends on the
    (unknown) GPS result, so iterate the fixed point: steps are 1 s
    apart and at least 6 months apart in time, so it converges in at
    most two correction passes (the zeroth estimate can fall just
    before a step whose insertion instant lies within `offset` seconds
    after it)."""
    gps = unix_s - GPS_UNIX_EPOCH
    for _ in range(3):
        nxt = unix_s - GPS_UNIX_EPOCH + gps_utc_offset_s(gps)
        if nxt == gps:
            break
        gps = nxt
    return gps
