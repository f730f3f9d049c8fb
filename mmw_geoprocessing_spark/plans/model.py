"""Request documents — the engine's "query language", mirroring the
reference's JSON schema (reference WebServer.scala:11-49).

``InputData`` (10 fields, WebServer.scala:11-22) drives ``/run``;
``MultiInput`` (WebServer.scala:45-49) drives ``/multi``. In this engine
AOIs/streams may be given either as GeoJSON (geometry path: parsed,
reprojected, rasterized) or as pre-rasterized mask/line table ids
(the fixture path used by the oracle suite).
"""

from __future__ import annotations

from dataclasses import dataclass, field

VALID_CRS = {"LatLng", "WebMercator", "ConusAlbers"}  # Utils.scala:208-213

VALID_OPERATIONS = {
    "RasterGroupedCount",
    "RasterGroupedCountMany",
    "RasterGroupedAverage",
    "RasterGroupedSum",
    "RasterLinesJoin",
    "RasterSummary",
}  # WebServer.scala:78-93 dispatch + historical O8


@dataclass
class InputData:
    """Reference InputData (WebServer.scala:11-22)."""

    operation_type: str
    rasters: list[str] = field(default_factory=list)
    target_raster: str | None = None
    # geometry path
    shape_geojson: list[str] | None = None
    shape_crs: str | None = None
    stream_lines_geojson: list[str] | None = None
    # reference InputData.vectorCRS (WebServer.scala:19): stream lines
    # may arrive in a different frame than the polygon
    vector_crs: str | None = None
    # pre-rasterized path (engine extension)
    aoi_ids: list[str] | None = None
    use_line_pixels: bool = False
    pixel_is_area: bool = False  # Utils.scala:109-118
    # zoom selects the grid frame for GeoJSON rasterization via
    # geometry.layout_for_zoom (0 = fixture frame; >0 = 512-tile
    # pyramid) — mirroring the reference's zoom-suffixed layer ids
    zoom: int = 0
    # raster frame: when set and != shape_crs, vector geometry is
    # reprojected shape_crs -> raster_crs before rasterizing (reference
    # Utils.scala:96-98,131-132). None = geometry already in the raster
    # frame (the fixture path).
    raster_crs: str | None = None
    # grid frame (geometry.GridLayout); None = the fixture 8x8 layout
    layout: object | None = None


@dataclass
class Operation:
    """One op inside /multi (WebServer.scala:34-43)."""

    name: str  # operationType
    label: str
    rasters: list[str] = field(default_factory=list)
    target_raster: str | None = None
    pixel_is_area: bool = False


@dataclass
class MultiInput:
    """Reference MultiInput (WebServer.scala:45-49)."""

    shapes: list[str]  # aoi ids (or GeoJSON when geometry path is active)
    # Reference HUC ids (WebServer.scala:32-35): the wire carries
    # ``shapes: [{id, shape}]``; ids key the response map. None (or a
    # None entry) falls back to positional ``shape_{i}`` labels — the
    # engine extension for bare-GeoJSON payloads.
    shape_ids: list[str | None] | None = None
    # reference MultiInput.streamLines (WebServer.scala:47): GeoJSON
    # MultiLineStrings consumed by RasterLinesJoin operations, clipped
    # per shape (Geoprocessing.scala:64-66; Utils.scala:196-198)
    stream_lines_geojson: list[str] | None = None
    operations: list[Operation] = field(default_factory=list)
    shape_crs: str | None = "LatLng"
    # Raster frame for GeoJSON shapes. The reference normalizes every
    # /multi shape into the raster grid's CRS unconditionally
    # (Geoprocessing.scala:23-24 normalizeHuc -> Utils.scala:96-98
    # toConusAlbers), so the default is ConusAlbers: a LatLng payload
    # (the wire default) is reprojected before rasterizing, while a
    # payload already in the raster frame (shape_crs == raster_crs)
    # passes through untouched.
    raster_crs: str | None = "ConusAlbers"
    # Grid frame for GeoJSON shape rasterization (engine extension —
    # the reference /multi always uses the catalog layer's native grid;
    # here 0 = fixture frame, ZOOM_NATIVE = the 30 m ladder).
    zoom: int = 0
