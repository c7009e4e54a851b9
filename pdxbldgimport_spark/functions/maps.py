"""Single-source CASE maps (reference F1 family, SURVEY.md §2.7).

Each mapping is declared once as a Python dict and rendered two ways:
``col_expr`` → a chained ``F.when`` Column (JVM-side, codegen'd),
``sql_case`` → the equivalent ANSI CASE text for the DuckDB oracle.
This mirrors the reference's hand-written CASE blocks
(tasks/pdx_shapes.rake:42-97, tasks/pdx_bldgs.rake:42-55,
tasks/clark_shapes.rake:285-330) while keeping engine and oracle
provably in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# street direction prefix (tasks/pdx_shapes.rake:44-53; no ELSE → NULL)
DIR_PRE = {
    "N": "North", "S": "South", "E": "East", "W": "West",
    "NW": "Northwest", "SW": "Southwest", "NE": "Northeast", "SE": "Southeast",
}
# direction suffix adds SB/NB (tasks/pdx_shapes.rake:54-65)
DIR_SUF = dict(DIR_PRE, SB="Southbound", NB="Northbound")

# street type expansion (tasks/pdx_shapes.rake:66-97; ELSE keeps input)
STREET_TYPE = {
    "ALY": "Alley", "AVE": "Avenue", "BLVD": "Boulevard", "BRG": "Bridge",
    "CIR": "Circle", "CIRC": "Circle", "CR": "Creek", "CRES": "Crest",
    "CRST": "Crescent", "CT": "Court", "DR": "Drive", "FWY": "Freeway",
    "HWY": "Highway", "LN": "Lane", "LOOP": "Loop", "LP": "Loop",
    "PARK": "Park", "PATH": "Path", "PKWY": "Parkway", "PL": "Place",
    "PT": "Point", "RD": "Road", "RDG": "Ridge", "SQ": "Square",
    "ST": "Street", "TER": "Terrace", "TERR": "Terrace", "VW": "View",
    "WALK": "Walk", "WAY": "Way", "WY": "Way",
}

# building type → OSM building tag (tasks/pdx_bldgs.rake:42-55; ELSE 'yes')
BLDG_TYPE = {
    "House": "detached", "HOUSES": "detached", "Houses": "detached",
    "Garage": "garage", "RES": "residential", "Res": "residential",
    "Duplex": "apartments", "Townhouse": "apartments",
    "Apartment Complex": "apartments", "Multiplex": "apartments",
    "Residential Condominiums": "apartments", "Dormitories": "dormitory",
}

# renamed arterials whose stale duplicates are deleted (tasks/pdx_addrs.rake:34-39)
RENAMED_ARTERIALS = [
    "Northeast Portland Boulevard",
    "North Portland Boulevard",
    "Northeast 39th Avenue",
    "Southeast 39th Avenue",
]

# diacritics repair (tasks/pdx_addrs.rake:42-51)
CHAVEZ = {
    "Northeast Cesar E Chavez Boulevard": "Northeast César E. Chávez Boulevard",
    "Southeast Cesar E Chavez Boulevard": "Southeast César E. Chávez Boulevard",
}


def col_expr(col: Column, mapping: dict[str, str], default: Column | None = None) -> Column:
    """Chained F.when CASE over ``mapping`` (order-stable)."""
    expr = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(default) if default is not None else expr


def sql_case(col: str, mapping: dict[str, str], default: str | None = None) -> str:
    """ANSI CASE text for the same mapping (oracle side)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    whens = " ".join(f"WHEN {q(k)} THEN {q(v)}" for k, v in mapping.items())
    els = f" ELSE {default}" if default is not None else ""
    return f"CASE {col} {whens}{els} END"


def initcap_sql(expr: str) -> str:
    """DuckDB emulation of Spark's initcap (capitalize first char of each
    space-delimited word, lowercase the rest; digits untouched). DuckDB
    has no initcap builtin."""
    return (
        f"array_to_string(list_transform(string_split({expr}, ' '), "
        f"s -> upper(s[1:1]) || lower(s[2:])), ' ')"
    )
