"""Point-in-polygon spatial join: cell-prefix equi-prefilter + exact
even-odd ray-cast refine.

Reference semantics: OGRLayer::FilterGeometry
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:1445) — envelope prefilter, then
exact geometry test — and the layer-algebra joins (ogrlayer.cpp:2278
Intersection etc.) which push the method layer's bbox into the input
layer scan. The even-odd parity rule matches GDAL's scanline fill
(alg/llrasterize.cpp:76).

Spark shape (scale-first):

1. polygons -> covering cells at an adaptive zoom (coarse cells for
   big polygons, capped at ``max_cells`` per polygon), exploded to
   (cell_id, poly row). The polygon side is usually the small side ->
   broadcast; above ``broadcast_max_rows`` exploded rows it shuffles.
2. points (the big table) -> ONE cell per zoom level via pure
   arithmetic on the packed cell id (no re-projection per level, no
   explode of the payload: only a narrow (key, lon, lat) projection is
   exploded, a semi-join pattern so image payload bytes never shuffle).
3. equi-join on cell_id -> candidate pairs.
4. exact refine: a vectorized pandas-UDF *filter* on the join output —
   no extra shuffle, no per-polygon grouping (so no skew from dense
   polygons); each Arrow batch factorizes its polygons and ray-casts
   all points per polygon at once.

At 100 TB: stage 2 is map-only; the only shuffle is the equi-join
(avoided entirely when the polygon side broadcasts); AQE skew-join
splits dense cells; adaptive polygon zoom keeps the build side small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import geom as geom_mod
from .. import grid, wkb
from .cells import assign_cells, cell_id_sql

DEFAULT_JOIN_ZOOM = 6
DEFAULT_MIN_ZOOM = 3


def polygon_cells(
    polys: DataFrame,
    join_zoom: int = DEFAULT_JOIN_ZOOM,
    min_zoom: int = DEFAULT_MIN_ZOOM,
    max_cells: int = 64,
    with_edges: bool = False,
) -> DataFrame:
    """Explode polygons to covering geodetic cells at a per-polygon
    adaptive zoom in [min_zoom, join_zoom]. Output: polygon columns +
    ``cell_id``. With ``with_edges``, also a pre-decoded flat edge
    array ([x1,y1,x2,y2] per edge, all rings — holes flip parity) so
    the refine can run as a JVM higher-order expression with no WKB
    decode and no Arrow transfer."""
    env_fields = [
        T.StructField(c, T.DoubleType(), False)
        for c in ("env_minx", "env_miny", "env_maxx", "env_maxy")
    ] + [T.StructField("is_rect", T.BooleanType(), False)]
    if with_edges:
        env_fields.append(
            T.StructField(
                "edges", T.ArrayType(T.ArrayType(T.DoubleType())), True
            )
        )
    out_schema = T.StructType(
        polys.schema.fields
        + [T.StructField("cell_id", T.LongType(), False)]
        + env_fields
    )
    cols = [f.name for f in polys.schema.fields]

    def explode_cells(batches):
        for pdf in batches:
            rows = {c: [] for c in cols}
            cells = []
            envs = {c.name: [] for c in env_fields}
            for rec in pdf.itertuples(index=False):
                d = dict(zip(cols, rec))
                g = bytes(d["geom_wkb"])
                z = geom_mod.zoom_for_max_cells(g, max_cells, max_zoom=join_zoom)
                z = max(z, min_zoom)
                cids = geom_mod.covering_cells_geodetic(g, z)
                env = [*wkb.envelope(g), _is_rectangle(g)]
                if with_edges:
                    env.append(None if env[-1] else _edge_list(g))
                for c in cols:
                    rows[c].extend([d[c]] * len(cids))
                for name, v in zip(envs, env):
                    envs[name].extend([v] * len(cids))
                cells.append(cids)
            if cells:
                yield pd.DataFrame(
                    {**rows, "cell_id": np.concatenate(cells).astype(np.int64),
                     **envs}
                )

    return polys.mapInPandas(explode_cells, schema=out_schema)


def _edge_list(geom_wkb: bytes) -> list:
    """All ring edges of a polygon as [[x1, y1, x2, y2], ...] (rings
    opened; every ring contributes — even-odd parity handles holes)."""
    out = []
    for ring in wkb.polygon_rings(geom_wkb):
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]
        nxt = np.roll(r, -1, axis=0)
        out.extend(
            np.concatenate([r, nxt], axis=1).tolist()
        )
    return out


def pip_parity_expr(lon_col: str, lat_col: str, edges_col: str = "edges") -> str:
    """Even-odd ray cast as a Catalyst higher-order expression over a
    pre-decoded edge array — the EXACT op sequence of
    geom.points_in_rings (cond on (y1>py)!=(y2>py); px < x-intercept),
    so results are bit-identical to the Arrow refine while staying
    entirely JVM-side (no Python workers in the hot path). A
    horizontal edge divides by zero -> NULL condition -> parity
    unchanged, matching the numpy kernel's cond mask.

    Measured alternatives (r4, 6M imgs / 8 cores, geom branch only):
    this nested-edge aggregate 8.7 s; the same walk over a FLAT
    [x1,y1,x2,y2,...] array via aggregate-over-indices 2.4x slower
    (4 element_at + index arithmetic per edge); an UNROLLED
    max_edges-wide sum-of-CASE codegen predicate 3x slower (the giant
    predicate exceeds what Janino/JIT handles and degrades to
    interpreted eval of 4*max_edges polymorphic element_ats). The
    higher-order aggregate is the fastest JVM representation."""
    return (
        f"aggregate({edges_col}, false, (acc, e) -> "
        f"CASE WHEN ((e[1] > {lat_col}) != (e[3] > {lat_col})) "
        f"AND {lon_col} < (e[2] - e[0]) * ({lat_col} - e[1]) "
        f"/ (e[3] - e[1]) + e[0] "
        f"THEN NOT acc ELSE acc END)"
    )


def _is_rectangle(geom_wkb: bytes) -> bool:
    """True iff the polygon IS its envelope (single axis-aligned
    rectangular ring) — then the bbox test is exact and the ray cast
    can be skipped (the m_bFilterIsEnvelope fast path of
    OGRLayer::FilterGeometry)."""
    rings = wkb.polygon_rings(geom_wkb)
    if len(rings) != 1:
        return False
    r = np.asarray(rings[0], dtype=np.float64)
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    if len(r) != 4:
        return False
    xs, ys = np.unique(r[:, 0]), np.unique(r[:, 1])
    if len(xs) != 2 or len(ys) != 2:
        return False
    # require axis-aligned alternating edges (dx==0 xor dy==0 per
    # edge): excludes bowtie orderings of the 4 corner points, whose
    # even-odd interior is NOT the envelope
    d = np.roll(r, -1, axis=0) - r
    return bool(np.all((d[:, 0] == 0) ^ (d[:, 1] == 0)))


def make_pip_udf():
    """Vectorized exact point-in-polygon refine (even-odd ray cast).
    Factorizes geometries per Arrow batch so each polygon's points are
    tested in one numpy pass."""

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, geom: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        if len(lon):
            codes, uniques = pd.factorize(geom)
            px = lon.values.astype(np.float64)
            py = lat.values.astype(np.float64)
            for code, g in enumerate(uniques):
                mask = codes == code
                out[mask] = geom_mod.points_in_wkb(px[mask], py[mask], bytes(g))
        return pd.Series(out)

    return pip


def prepare_spatial_join(
    polys: DataFrame,
    join_zoom: int = DEFAULT_JOIN_ZOOM,
    min_zoom: int = DEFAULT_MIN_ZOOM,
    max_cells: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast: bool | None = None,
    broadcast_max_rows: int = 2_000_000,
    poly_count_hint: int | None = None,
    poly_cols: list[str] | None = None,
    refine: str = "jvm",
) -> "PreparedSpatialJoin":
    """Build the polygon side of the PIP join ONCE (adaptive cell
    cover + localCheckpoint + zoom-level set + broadcast hints) and
    return a reusable prober.

    A production pipeline joins a static polygon layer against many
    point batches; preparing the layer amortizes the cover build and
    its zoom-set action across every probe. That driver-side serial
    prefix idles (cores-1)/cores of the cluster per batch — exactly
    the Amdahl term that erodes N->4N scaling on short batches
    (profiled: ~1 s of a 20 s 32-core leg before this split)."""
    poly_cols = poly_cols or [c for c in polys.columns if c != "geom_wkb"]

    env_cols = ["env_minx", "env_miny", "env_maxx", "env_maxy"]
    # when the polygon count is known, right-size the cover build's
    # task count BEFORE the Python explode UDF: a tiny dim layer
    # inherited from a wide leaf (leafNodeDefaultParallelism) otherwise
    # lands ~16 rows per task and the stage is pure Python-worker
    # round-trip churn (profiled: 128 tasks / 83 core-s for 2048 polys
    # at 32 cores). ~128 polys per task keeps the per-task UDF work
    # well above the worker dispatch cost; coalesce is narrow (no
    # shuffle) and a genuinely large layer keeps full parallelism.
    n_poly = poly_count_hint
    polys_src = polys
    if n_poly is not None:
        par = polys.sparkSession.sparkContext.defaultParallelism
        polys_src = polys.coalesce(max(1, min(n_poly // 128 + 1, par)))
    # the exploded polygon side is small (<= max_cells * n_poly rows)
    # and feeds two broadcast builds -> localCheckpoint so the explode
    # UDF runs once, not once per branch; unlike persist(), the
    # checkpoint blocks release automatically when the RDD is
    # unreferenced (no cache accumulation across repeated calls)
    pcells = polygon_cells(
        polys_src, join_zoom, min_zoom, max_cells, with_edges=refine == "jvm"
    ).localCheckpoint(eager=True)
    # rectangle polygons: the envelope test IS the exact test
    # (m_bFilterIsEnvelope, ogrlayer.cpp) -> a pure-JVM branch that
    # never ships WKB through the broadcast nor rows through Arrow
    geom_col = "edges" if refine == "jvm" else "geom_wkb"
    # (A local-relation dim variant — pre-collecting the cover to the
    # driver so broadcast builds skip the distributed scan — was
    # measured 2x WORSE per pass (1.1 s vs 0.6 s fixed cost at 32
    # cores): the driver re-serializes the 42k Python-side rows into
    # every execution.  Negative result recorded in
    # BENCH/PROFILE_r4.md; the checkpointed distributed cover stays.)
    rect_cells = pcells.filter("is_rect").select("cell_id", *env_cols, *poly_cols)
    geom_cells = pcells.filter("NOT is_rect").select(
        "cell_id", geom_col, *env_cols, *poly_cols
    )
    # the jvm refine runs as a single fused probe (one scan of the
    # point side); it keeps is_rect + edges together in one broadcast
    all_cells = pcells.select(
        "cell_id", "is_rect", *([geom_col] if refine == "jvm" else []),
        *env_cols, *poly_cols,
    )
    if broadcast is None:
        # decide from the un-exploded polygon count — a size hint
        # avoids the extra count() action in the hot path; without
        # one, the count is cheap and bounded by max_cells blowup
        n_poly = n_poly if n_poly is not None else polys.count()
        broadcast = n_poly * max_cells <= broadcast_max_rows
    if broadcast:
        rect_cells = F.broadcast(rect_cells)
        geom_cells = F.broadcast(geom_cells)
        all_cells = F.broadcast(all_cells)

    # The probe's explode is pruned to the zoom levels ACTUALLY
    # PRESENT in the polygon cover (one tiny action on the
    # checkpointed cover table): a point's z-cell can only match
    # covers at z, so absent levels are dead rows — for a typical
    # small-polygon layer this cuts the probe traffic from
    # (join_zoom - min_zoom + 1)x to 1-2x, which is the difference
    # between bandwidth-bound and compute-bound at full parallelism.
    # Cell ids pack the zoom in the top bits (grid.pack_cell).
    meta = pcells.agg(
        F.collect_set(F.expr("shiftright(cell_id, 58)")).alias("zs")
    ).first()
    zs = sorted(meta["zs"] or []) or [join_zoom]
    return PreparedSpatialJoin(
        rect_cells, geom_cells, all_cells, zs, join_zoom,
        lon_col, lat_col, poly_cols, refine, pcells,
    )


class PreparedSpatialJoin:
    """The polygon side of a PIP join, prepared once and probed many
    times (see ``prepare_spatial_join``). Holds the checkpointed cell
    cover (the reference keeps its blocks alive), the pruned zoom set
    and the broadcast-hinted branch tables; ``probe`` is pure plan
    construction — no driver-side actions."""

    def __init__(
        self, rect_cells, geom_cells, all_cells, zs, join_zoom,
        lon_col, lat_col, poly_cols, refine, pcells,
    ):
        self.rect_cells = rect_cells
        self.geom_cells = geom_cells
        self.all_cells = all_cells
        self.zs = zs
        self.join_zoom = join_zoom
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.poly_cols = poly_cols
        self.refine = refine
        self._pcells = pcells  # keeps checkpoint blocks referenced

    def probe(
        self,
        points: DataFrame,
        point_cols: list[str] | None = None,
        engine: str = "sql",
        shared_broadcast: bool = False,
        heavy_points: DataFrame | None = None,
    ) -> DataFrame:
        """Inner PIP join of ``points`` against the prepared polygon
        layer: rows = (point, polygon) pairs where the point lies
        inside the polygon (even-odd rule).

        ``shared_broadcast``: with the jvm refine, probe BOTH branches
        against the single ``all_cells`` broadcast (post-join is_rect
        split) so the per-execution broadcast build happens once and
        Catalyst's ReuseExchange shares it — trades slightly wider
        broadcast rows in the rect branch for one build per batch
        instead of two (the scaling campaign's broadcast-rebuild A/B).
        ``heavy_points``: an alternative point-side DataFrame (same
        schema/contents, typically finer-partitioned) used ONLY for
        the heavy refine branch, so its final wave is finer-grained
        without inflating the cheap rect branch's task-dispatch cost."""
        lon_col, lat_col = self.lon_col, self.lat_col
        join_zoom, refine = self.join_zoom, self.refine
        point_cols = point_cols or [
            c for c in points.columns if c not in (lon_col, lat_col)
        ]

        # point side: cell at join_zoom, then ancestors via pure int
        # arithmetic, exploded on a narrow projection (a semi-join
        # pattern: image payload bytes never shuffle).
        def _pts(src: DataFrame) -> DataFrame:
            pts = assign_cells(
                src, join_zoom, grid_kind="geodetic", lon_col=lon_col,
                lat_col=lat_col, engine=engine,
            )
            levels = [
                F.expr(
                    cell_id_sql(
                        f"(tile_x >> {join_zoom - z})",
                        f"(tile_y >> {join_zoom - z})",
                        z,
                    )
                )
                for z in self.zs
            ]
            if len(levels) == 1:
                # single-zoom cover: no explode stage at all
                return pts.select(
                    lon_col, lat_col, *point_cols, levels[0].alias("cell_id")
                )
            return pts.select(
                lon_col, lat_col, *point_cols,
                F.explode(F.array(*levels)).alias("cell_id"),
            )

        pts = _pts(points)
        pts_heavy = _pts(heavy_points) if heavy_points is not None else pts

        # envelope reject, JVM-side (FilterGeometry's bbox fast path,
        # ogrlayer.cpp:1468) — cuts the refine input before any Python
        def bbox(df: DataFrame) -> DataFrame:
            return df.filter(
                (F.col(lon_col) >= F.col("env_minx"))
                & (F.col(lon_col) <= F.col("env_maxx"))
                & (F.col(lat_col) >= F.col("env_miny"))
                & (F.col(lat_col) <= F.col("env_maxy"))
            )

        out_cols = [lon_col, lat_col, *point_cols, *self.poly_cols]
        if refine == "jvm_fused":
            # single-probe variant: one scan of the point side, but the
            # whole candidate stream (including rectangle candidates)
            # pays the CodegenFallback eval of the higher-order PIP —
            # measured 1.5x slower than the two-branch default on the
            # synth layer (rect-heavy hot cell). Useful when the layer
            # is overwhelmingly non-rect.
            cand = bbox(pts.join(self.all_cells, "cell_id", "inner"))
            refined = cand.filter(
                F.expr(f"is_rect OR ({pip_parity_expr(lon_col, lat_col)})")
            )
            return refined.select(*out_cols)
        if refine == "jvm" and shared_broadcast:
            # single shared broadcast: both branches join all_cells and
            # split on is_rect AFTER the join — ReuseExchange makes the
            # second branch a ReusedExchange of the first's broadcast,
            # so each batch execution builds/ships ONE hash relation
            # the rect branch must CONSUME the geom column, or column
            # pruning gives it a narrower broadcast child than the
            # heavy branch and the two exchanges no longer
            # canonicalize equal (no reuse).  coalesce(size(...)) is
            # non-foldable and always >= -1, so the predicate is a
            # no-op that pins the shared schema.
            geom_keep = "coalesce(size(edges), -1) >= -100"
            rect_out = bbox(
                pts.join(self.all_cells, "cell_id", "inner")
            ).filter(f"is_rect AND ({geom_keep})").select(*out_cols)
            cand = bbox(
                pts_heavy.join(self.all_cells, "cell_id", "inner")
            ).filter("NOT is_rect")
            refined = cand.filter(F.expr(pip_parity_expr(lon_col, lat_col)))
            return refined.select(*out_cols).unionAll(rect_out)
        rect_out = bbox(
            pts.join(self.rect_cells, "cell_id", "inner")
        ).select(*out_cols)
        if refine == "jvm":
            # two probes (rect codegen fast path / edge-walk refine),
            # each against its own narrow broadcast: the point
            # generation is re-run per branch but is pure codegen
            # (cheap); keeping the rectangle majority out of the
            # interpreted refine dominates. The HEAVY refine branch
            # goes first in the union: both branches run in one stage
            # in partition order, so heavy-first lets the cheap rect
            # tasks fill the scheduler tail instead of an all-heavy
            # final wave (profiled 4.5x task-duration spread in the
            # combined stage at 32 cores).
            cand = bbox(pts_heavy.join(self.geom_cells, "cell_id", "inner"))
            refined = cand.filter(F.expr(pip_parity_expr(lon_col, lat_col)))
            return refined.select(*out_cols).unionAll(rect_out)
        cand = bbox(pts.join(self.geom_cells, "cell_id", "inner"))
        # homogenize Arrow batches by polygon (local sort, no shuffle)
        # so the refine factorization sees few distinct geometries per
        # batch
        cand = cand.sortWithinPartitions("geom_wkb")
        pip = make_pip_udf()
        refined = cand.filter(
            pip(F.col(lon_col), F.col(lat_col), F.col("geom_wkb"))
        )
        return rect_out.unionAll(refined.select(*out_cols))


def spatial_join(
    points: DataFrame,
    polys: DataFrame,
    join_zoom: int = DEFAULT_JOIN_ZOOM,
    min_zoom: int = DEFAULT_MIN_ZOOM,
    max_cells: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast: bool | None = None,
    broadcast_max_rows: int = 2_000_000,
    poly_count_hint: int | None = None,
    point_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
    engine: str = "sql",
    refine: str = "jvm",
) -> DataFrame:
    """Inner PIP join: rows = (point, polygon) pairs where the point
    lies inside the polygon (even-odd rule).

    refine='jvm' (default) evaluates the exact ray cast as a Catalyst
    higher-order expression over pre-decoded edge arrays — the whole
    join stays JVM-side with zero Arrow traffic (the scale path on a
    memory-bandwidth-bound host). refine='arrow' is the vectorized
    pandas-UDF kernel (same arithmetic, bit-identical output).

    One-shot convenience over prepare_spatial_join().probe(); repeated
    probes against the same layer should prepare once."""
    return prepare_spatial_join(
        polys,
        join_zoom=join_zoom,
        min_zoom=min_zoom,
        max_cells=max_cells,
        lon_col=lon_col,
        lat_col=lat_col,
        broadcast=broadcast,
        broadcast_max_rows=broadcast_max_rows,
        poly_count_hint=poly_count_hint,
        poly_cols=poly_cols,
        refine=refine,
    ).probe(points, point_cols=point_cols, engine=engine)


def spatial_join_bruteforce(
    points: DataFrame,
    polys: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
) -> DataFrame:
    """Cross-join + exact refine — the oracle for tests (no cell
    prefilter, same PIP kernel)."""
    point_cols = point_cols or [
        c for c in points.columns if c not in (lon_col, lat_col)
    ]
    poly_cols = poly_cols or [c for c in polys.columns if c != "geom_wkb"]
    cand = points.select(lon_col, lat_col, *point_cols).crossJoin(
        F.broadcast(polys.select("geom_wkb", *poly_cols))
    )
    pip = make_pip_udf()
    return cand.filter(pip(F.col(lon_col), F.col(lat_col), F.col("geom_wkb"))).select(
        lon_col, lat_col, *point_cols, *poly_cols
    )
