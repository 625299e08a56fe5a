"""PIP / region join pipelines over the synthetic geotagged tables."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry import fixtures
from ..geometry.cap import Cap
from ..geometry.rect import LatLngRect
from ..stages import pip as pip_stages
from ..stages.exchange import actor_map as _actor_map
from ..stages.encode import derive_geotags


def standard_polygon_layer():
    """The polygon layer used by queries/bench: canonical fixture loops +
    urban hot-spot polygons (geometry/fixtures.py)."""
    layer = fixtures.polygon_layer()
    # hemispheres dominate everything (50% hit rate each); keep the layer
    # representative but selective for join output sizes
    for k in ["north_hemi", "south_hemi", "east_hemi", "west_hemi"]:
        layer.pop(k)
    return layer


def shape_index_pip_join(ds, key_col: str, layer=None, concurrency=None,
                         batch_size: int = 131072):
    """PIP join computed through the MutableShapeIndex point-location path
    (geometry/shape_index.py) — a THIRD independent implementation of the
    same join (broadcast PIPJoin actors and the covering-explode shuffle
    being the other two), sharing the same SQL oracle.  Point location is
    fully batched (MutableShapeIndex.contains_points: leaf ids for the
    whole batch, searchsorted ancestor probes per index level, vectorized
    crossing-parity per located cell with the scalar robust predicates
    only as the uncertain-pair fallback).  Output (key_col, polygon_id),
    identical to pip_join."""
    from ..functions.coords import latlng_deg_to_xyz as _to_xyz
    from ..geometry import shape_index as si
    from ..geometry.loop import Polygon as _Polygon
    from ..stages.encode import derive_geotags

    if layer is None:
        layer = standard_polygon_layer()

    class ShapeIndexPIP:
        def __init__(self, layer):
            import ray

            if isinstance(layer, ray.ObjectRef):
                layer = ray.get(layer)
            self.geotag = lambda b: derive_geotags(b, key_col)
            # index built ONCE per actor (coverings + postings + seeds)
            self.index = si.MutableShapeIndex(
                max_cells_per_shape=32, max_level=12
            )
            self.pids: list = []
            for pid, loops in sorted(layer.items()):
                poly = (
                    loops
                    if isinstance(loops, _Polygon)
                    else _Polygon.from_loops_latlng_deg(loops)
                )
                self.index.add_shape(si.PolygonShape(poly))
                self.pids.append(pid)
            self.index.build()

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = self.geotag(batch)  # fused: no separate wrapper stage
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            lng = batch["lng"].to_numpy(zero_copy_only=False)
            x, y, z = _to_xyz(lat, lng)
            pts = np.stack([x, y, z], axis=-1)
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            pt_idx, sids = self.index.contains_points(pts)
            pid_arr = np.asarray(self.pids, dtype=object)
            return pa.table(
                {
                    key_col: pa.array(keys[pt_idx],
                                      type=batch[key_col].type),
                    "polygon_id": pa.array(pid_arr[sids], type=pa.string()),
                }
            )

    import ray

    return _actor_map(
        ds,
        ShapeIndexPIP,
        fn_constructor_kwargs={"layer": ray.put(layer) if ray.is_initialized() else layer},
        batch_size=batch_size,
        concurrency=concurrency,
    )


def standard_caps() -> dict[str, Cap]:
    from ..functions.geo import CLUSTER_LAT, CLUSTER_LNG

    caps = {}
    for i, (clat, clng) in enumerate(zip(CLUSTER_LAT, CLUSTER_LNG)):
        caps[f"cap_urban_{i}"] = Cap.from_latlng_deg(float(clat), float(clng), 2.0)
    caps["cap_equator"] = Cap.from_latlng_deg(0.0, 0.0, 10.0)
    caps["cap_north_pole"] = Cap.from_latlng_deg(90.0, 0.0, 12.0)
    return caps


def standard_rects() -> dict[str, LatLngRect]:
    return {
        "rect_europe": LatLngRect.from_degrees(35.0, -10.0, 60.0, 30.0),
        "rect_antimeridian": LatLngRect.from_degrees(-20.0, 170.0, 20.0, -170.0),
        "rect_south": LatLngRect.from_degrees(-80.0, -180.0, -60.0, 180.0),
    }


class _GeotagEncodeStage:
    """Generic pipeline-layer fusion: geotag_and_encode + any broadcast
    stage actor in one wrapper (same argument as _GeotagEncodePIPJoin)."""

    def __init__(self, stage_cls, key_col: str, **stage_kwargs):
        from ..stages.encode import geotag_and_encode

        self.inner = stage_cls(key_col=key_col, **stage_kwargs)
        self.enc = geotag_and_encode(key_col)

    def __call__(self, batch):
        return self.inner(self.enc(batch))


class _GeotagEncodePIPJoin:
    """Pipeline-layer fusion: geotag + encode + PIP join in ONE actor
    call — one wrapper layer fewer per batch than a separate geotag stage
    (~25% faster end-to-end at sf0.1; Ray fuses chained stages into one
    operator either way, but each extra map_batches wrapper re-slices and
    re-wraps every batch).  The encode policy (which derived columns the
    semi/anti pass-through modes must hide) lives HERE, at the pipeline
    layer — the shared PIPJoin stage stays mode-agnostic."""

    def __init__(self, layer, key_col: str, mode: str):
        from ..stages.encode import geotag_and_encode

        self.inner = pip_stages.PIPJoin(layer, key_col=key_col, mode=mode)
        self.enc = geotag_and_encode(key_col)
        self.mode = mode

    def __call__(self, batch):
        out = self.inner(self.enc(batch))
        if self.mode in ("semi", "anti"):
            # filtered pass-through modes must not leak derived columns
            out = out.select(batch.column_names)
        return out


def pip_join(ds, key_col: str, layer=None, mode: str = "inner", concurrency=None):
    """Broadcast PIP join: one fused geotag+encode+join actor-pool stage.

    At scale `concurrency` is sized to the cluster; the layer rides the
    object store once per actor (PIPJoin.__init__), never per batch.

    batch_size 131072: every actor-pool batch is a separate actor call
    (RPC + object-store arg/result round trip) — at 32768 that per-call
    overhead halved 4-slot throughput on a materialized input (measured
    10.7 s -> 5.9 s at 131072; 262144 regresses on cache pressure).
    """
    if layer is None:
        layer = standard_polygon_layer()
    prepared = pip_stages.prepare_layer(layer)  # coverer runs ONCE, driver-side
    return _actor_map(
        ds,
        _GeotagEncodePIPJoin,
        fn_constructor_kwargs={"layer": prepared, "key_col": key_col,
                               "mode": mode},
        batch_size=131072,
        concurrency=concurrency,
    )


def standard_routes():
    """Fixture polylines ('routes') for the route-buffer join: one passing
    through urban cluster 0, one along the equator cluster band."""
    import numpy as np

    from ..geometry.polyline import Polyline

    return {
        "route_nyc": Polyline.from_latlng_deg(
            np.array([39.5, 40.5, 40.75, 41.2, 42.0]),
            np.array([-75.5, -74.4, -74.0, -73.6, -72.8]),
        ),
        "route_equator": Polyline.from_latlng_deg(
            np.array([5.5, 6.5, 7.0, 7.5]),
            np.array([2.0, 3.375, 4.5, 6.0]),
        ),
    }


def route_buffer_join(ds, key_col: str, routes=None, radius_deg: float = 0.75,
                      concurrency=None):
    """Points within `radius_deg` of each route polyline — the
    'images within r of route' join (stages/distance.RouteBufferJoin)."""
    import math

    from ..geometry.cap import chord2_from_radians
    from ..stages import distance as dist_stages
    from ..stages.encode import geotag_and_encode

    if routes is None:
        routes = standard_routes()
    radius_rad = math.radians(radius_deg)
    chord2 = chord2_from_radians(radius_rad)
    prepared = dist_stages.prepare_polyline_layer(routes, radius_rad, chord2)
    return _actor_map(
        ds,
        _GeotagEncodeStage,
        fn_constructor_kwargs={"stage_cls": dist_stages.RouteBufferJoin,
                               "key_col": key_col, "prepared": prepared},
        batch_size=131072,
        concurrency=concurrency,
    )


def boolean_fixture_polys():
    """Two overlapping squares straddling urban cluster 0 (40.75, -74) —
    the A/B inputs for the boolean-op pipeline and its oracle."""
    from ..geometry.loop import Polygon, latlng_deg_to_unit_xyz
    from ..geometry.loop import Loop

    import numpy as np

    def sq(lat1, lng1, lat2, lng2):
        lats = np.array([lat1, lat1, lat2, lat2], float)
        lngs = np.array([lng1, lng2, lng2, lng1], float)
        return Polygon([Loop(latlng_deg_to_unit_xyz(lats, lngs))])

    return sq(40.4, -74.3, 40.8, -73.9), sq(40.6, -74.1, 41.1, -73.7)


def boolean_pip_join(ds, key_col: str, concurrency=None):
    """PIP join against CLIPPED boolean products of the fixture squares:
    the engine geometrically clips union/intersection/difference
    (geometry/boolean.py) and joins points against the RESULT polygons;
    the oracle (oracle/pip_sql.q_boolean_pip) instead applies set algebra
    (OR/AND/EXCEPT) to crossing-parity membership in the ORIGINAL squares
    — agreement is a genuine independent verification of the clipping."""
    from ..geometry import boolean as B

    pa, pb = boolean_fixture_polys()
    layer = {
        "union": B.boolean_op(pa, pb, "union"),
        "intersection": B.boolean_op(pa, pb, "intersection"),
        "difference": B.boolean_op(pa, pb, "difference"),
    }
    return pip_join(ds, key_col, layer=layer, concurrency=concurrency)


def within_distance_join(ds, key_col: str, layer=None, radius_deg: float = 1.5,
                         concurrency=None):
    """Buffered region join: (key, polygon_id) for points within
    `radius_deg` of each polygon (inside or near the boundary).  Broadcast
    actor pool over radius-expanded coverings; see stages/distance.py."""
    import math

    from ..geometry.cap import chord2_from_radians
    from ..stages import distance as dist_stages
    from ..stages.encode import geotag_and_encode

    if layer is None:
        layer = standard_polygon_layer()
    radius_rad = math.radians(radius_deg)
    chord2 = chord2_from_radians(radius_rad)
    prepared = dist_stages.prepare_distance_layer(layer, radius_rad, chord2)
    return _actor_map(
        ds,
        _GeotagEncodeStage,
        fn_constructor_kwargs={"stage_cls": dist_stages.WithinDistanceJoin,
                               "key_col": key_col, "prepared": prepared},
        batch_size=131072,
        concurrency=concurrency,
    )


def cap_join(ds, key_col: str, caps=None):
    if caps is None:
        caps = standard_caps()
    # geotag + join fused in one wrapper (task pool: stateless fn)
    return ds.map_batches(
        lambda b: pip_stages.cap_join(derive_geotags(b, key_col), caps, key_col),
        batch_format="pyarrow",
    )


def rect_join(ds, key_col: str, rects=None):
    if rects is None:
        rects = standard_rects()
    return ds.map_batches(
        lambda b: pip_stages.rect_join(derive_geotags(b, key_col), rects, key_col),
        batch_format="pyarrow",
    )
