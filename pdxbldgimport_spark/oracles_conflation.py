"""DuckDB oracle SQL for the conflation chain — generated from the same
mapping dicts the Spark operators use (functions.maps), so engine and
oracle can't drift. Mirrors tasks/pdx_addrs.rake, tasks/pdx_shapes.rake
(master_address cleanup + addr_bldg_counts), tasks/pdx_bldgs.rake."""

from __future__ import annotations

from . import synth
from .functions import maps as M
from .geo import cells as C

_IC_FNAME = M.initcap_sql("regexp_replace(fname, '\"', '', 'g')")
_FNAME = (
    f"CASE WHEN regexp_matches({_IC_FNAME}, '(^|\\s+)hwy ', 'i') "
    f"THEN regexp_replace({_IC_FNAME}, 'Hwy', 'Highway', 'g') "
    f"ELSE {_IC_FNAME} END"
)
_ARTERIALS = ", ".join(f"'{s}'" for s in M.RENAMED_ARTERIALS)
_CHAVEZ_CASE = M.sql_case("street", M.CHAVEZ, default="street")

# street = array_to_string(ARRAY[fdpre,fname,ftype,fdsuf],' ') — null-skipping
PDX_ADDRS_CTES = f"""
, pdx_addrs0 AS (
  SELECT DISTINCT
    cpid AS state_id,
    address_id,
    housenumber,
    concat_ws(' ',
      {M.sql_case('fdpre', M.DIR_PRE)},
      {_FNAME},
      {M.sql_case('ftype', M.STREET_TYPE, default='ftype')},
      {M.sql_case('fdsuf', M.DIR_SUF)}
    ) AS street,
    postcode,
    {M.initcap_sql('mail_city')} AS city,
    'OR' AS state,
    'US' AS country,
    lon, lat
  FROM caddr
  WHERE unit_no IS NULL
), pdx_addrs1 AS (
  SELECT * FROM pdx_addrs0 a
  WHERE NOT (a.street IN ({_ARTERIALS}) AND EXISTS (
    SELECT 1 FROM pdx_addrs0 b
    WHERE b.state_id = a.state_id
      AND b.housenumber = a.housenumber
      AND b.street <> a.street))
), pdx_addrs AS (
  SELECT state_id, address_id, housenumber,
         {_CHAVEZ_CASE} AS street,
         postcode, city, state, country, lon, lat
  FROM pdx_addrs1
)
"""

COUNTS_CTES = """
, abc AS (
  SELECT a.state_id, a.addr_count, b.bldg_count
  FROM (SELECT state_id, COUNT(*) AS addr_count FROM pdx_addrs GROUP BY state_id) a
  JOIN (SELECT cpid AS state_id, COUNT(*) AS bldg_count FROM cbldg_base GROUP BY cpid) b
    USING (state_id)
)
"""

HG_CTES = """
, hg AS (
  SELECT DISTINCT a.cpid AS state_id, c.addr_count
  FROM cbldg_base a
  JOIN cbldg_base b ON a.cpid = b.cpid
  JOIN abc c ON c.state_id = a.cpid
  WHERE c.bldg_count = 2
    AND ((lower(a.bldg_type_raw) LIKE 'house%' AND lower(b.bldg_type_raw) = 'garage')
      OR (lower(b.bldg_type_raw) LIKE 'house%' AND lower(a.bldg_type_raw) = 'garage'))
)
"""

# P6 residential reclassification (tasks/pdx_shapes.rake:133-138) —
# applied on the raw type before the BLDG_TYPE map, mirroring
# conflation.residential_reclass at engine ingest.
_RECLASS = (
    "(CASE WHEN (b.bldg_type_raw IS NULL OR b.bldg_type_raw = 'Not Set') "
    "AND (lower(b.bldg_use) LIKE '%residential%' "
    "OR lower(b.bldg_use) LIKE '%house%') "
    "THEN 'Res' ELSE b.bldg_type_raw END)"
)
_BLDG_CASE = M.sql_case(_RECLASS, M.BLDG_TYPE, default="'yes'")

_TILE = (
    f"CAST(LEAST(GREATEST(FLOOR((cy - ({C.LAT_S!r})) / {C.SPAN_Y!r} * 32e0), 0), 31) AS BIGINT) * 32 "
    f"+ CAST(LEAST(GREATEST(FLOOR((cx - ({C.LON_W!r})) / {C.SPAN_X!r} * 32e0), 0), 31) AS BIGINT)"
)

PDX_BLDGS_CTES = f"""
, v AS (
  SELECT b.cpid AS state_id,
         b.bldg_id,
         a.address_id, a.housenumber, a.street, a.postcode, a.city, a.state, a.country,
         b.num_story AS levels,
         round(b.surf_elev * 0.3048e0, 1) AS ele,
         round(b.max_height * 0.3048e0, 1) AS height,
         {_BLDG_CASE} AS bldg_type,
         COALESCE(c.addr_count, 0) AS no_addrs,
         COALESCE(c.bldg_count, 0) AS bldg_count,
         FALSE AS is_deleted,
         (b.bx0 + b.bx1) / 2e0 AS cx,
         (b.by0 + b.by1) / 2e0 AS cy,
         (b.bx1 - b.bx0) * (b.by1 - b.by0) AS area
  FROM cbldg_base b
  LEFT JOIN pdx_addrs a ON a.state_id = b.cpid
  JOIN abc c ON c.state_id = b.cpid
), unioned AS (
  SELECT * FROM v
  WHERE no_addrs <= 1
     OR state_id IN (SELECT state_id FROM hg WHERE addr_count <= 1)
  UNION ALL
  SELECT DISTINCT state_id, bldg_id,
         CAST(NULL AS BIGINT) AS address_id,
         CAST(NULL AS VARCHAR) AS housenumber,
         CAST(NULL AS VARCHAR) AS street,
         CAST(NULL AS VARCHAR) AS postcode,
         CAST(NULL AS VARCHAR) AS city,
         CAST(NULL AS VARCHAR) AS state,
         CAST(NULL AS VARCHAR) AS country,
         levels, ele, height, bldg_type, no_addrs, bldg_count,
         FALSE AS is_deleted,
         cx, cy, area
  FROM v
  WHERE (no_addrs > 1 AND bldg_count = 1)
     OR state_id IN (SELECT state_id FROM hg WHERE addr_count > 1)
), garaged AS (
  SELECT state_id, bldg_id,
         CASE WHEN gnull THEN NULL ELSE address_id END AS address_id,
         CASE WHEN gnull THEN NULL ELSE housenumber END AS housenumber,
         CASE WHEN gnull THEN NULL ELSE street END AS street,
         CASE WHEN gnull THEN NULL ELSE city END AS city,
         CASE WHEN gnull THEN NULL ELSE postcode END AS postcode,
         CASE WHEN gnull THEN NULL ELSE state END AS state,
         country, levels, ele, height, bldg_type, no_addrs, bldg_count,
         is_deleted, cx, cy, area,
         {_TILE} AS qtrsec
  FROM (
    SELECT *,
           lower(bldg_type) = 'garage'
           AND (address_id IS NOT NULL
                OR state_id IN (SELECT state_id FROM hg)) AS gnull
    FROM unioned
  ) g
), mx AS (
  SELECT state_id, MAX(area) AS max_area
  FROM garaged
  WHERE state_id IN (
    SELECT state_id FROM garaged
    WHERE street IS NOT NULL AND no_addrs = 1
    GROUP BY state_id HAVING COUNT(*) > 1)
  GROUP BY state_id
), pdx_bldgs AS (
  SELECT g.state_id, g.bldg_id,
         CASE WHEN hit THEN NULL ELSE g.address_id END AS address_id,
         CASE WHEN hit THEN NULL ELSE g.housenumber END AS housenumber,
         CASE WHEN hit THEN NULL ELSE g.street END AS street,
         CASE WHEN hit THEN NULL ELSE g.city END AS city,
         CASE WHEN hit THEN NULL ELSE g.postcode END AS postcode,
         CASE WHEN hit THEN NULL ELSE g.state END AS state,
         g.country, g.levels, g.ele, g.height, g.bldg_type,
         g.no_addrs, g.bldg_count, g.is_deleted, g.qtrsec, g.cx, g.cy
  FROM (
    SELECT g.*, m.max_area IS NOT NULL AND g.area <> m.max_area AS hit
    FROM garaged g LEFT JOIN mx m ON m.state_id = g.state_id
  ) g
)
"""


MULTI_ADDRS_CTES = """
, mb AS (
  SELECT * FROM pdx_bldgs WHERE no_addrs > 1 AND is_deleted = FALSE
), inside AS (
  SELECT b.bldg_id
  FROM pdx_bldgs b
  JOIN cbldg_base cb ON cb.bldg_id = b.bldg_id
  JOIN pdx_addrs a
    ON a.lon >= cb.bx0 AND a.lon < cb.bx1
   AND a.lat >= cb.by0 AND a.lat < cb.by1
  WHERE b.no_addrs > 1
  GROUP BY b.bldg_id
  HAVING COUNT(*) = AVG(b.no_addrs)
), brancha AS (
  SELECT b.bldg_id AS pdx_bldg_id, b.state_id, b.qtrsec,
         a.housenumber, a.street, a.postcode, a.city, a.state
  FROM mb b
  JOIN pdx_addrs a ON a.state_id = b.state_id
  WHERE b.bldg_id IN (SELECT bldg_id FROM inside)
), aa AS (
  SELECT ROW_NUMBER() OVER (PARTITION BY state_id
                            ORDER BY housenumber, address_id) AS num,
         housenumber, street, postcode, city, state, state_id
  FROM pdx_addrs
), bb AS (
  SELECT unnest(generate_series(1, CAST(no_addrs AS BIGINT))) AS num,
         qtrsec, state_id, bldg_id
  FROM mb
  WHERE bldg_type <> 'garage'
), branchb AS (
  SELECT b.bldg_id AS pdx_bldg_id, b.state_id, b.qtrsec,
         a.housenumber, a.street, a.postcode, a.city, a.state
  FROM aa a
  JOIN bb b ON a.state_id = b.state_id AND a.num = b.num
  WHERE a.state_id NOT IN (SELECT state_id FROM brancha)
), multi_addrs AS (
  SELECT * FROM brancha UNION ALL SELECT * FROM branchb
)
"""


def with_prefix(*extra: str, bases: tuple[str, ...] = ()) -> str:
    """Full WITH chain: synth bases + conflation CTEs (+ caller extras).
    ``bases`` adds further synth tables (footprints_base, osm_ways_base…)
    to the default caddr/cbldg_base pair."""
    base = synth.oracle_with("caddr", "cbldg_base", *bases).rstrip()
    return base + PDX_ADDRS_CTES + COUNTS_CTES + HG_CTES + "".join(extra)
