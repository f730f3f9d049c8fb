"""Typed error taxonomy — parity with the reference's exception handler
(reference ErrorHandler.scala:8-46; all map to HTTP 400, unknown -> 500).
"""

from __future__ import annotations


class GeoprocessingError(Exception):
    """Base of the 400-class errors."""

    status = 400


class InvalidOperationError(GeoprocessingError):
    """Unknown operationType (reference WebServer.scala:89-92)."""


class MissingTargetRasterError(GeoprocessingError):
    """Average/GroupedAverage without targetRaster (Geoprocessing.scala:139-143)."""


class MissingVectorError(GeoprocessingError):
    """Operation requires a vector AOI and none was given (Geoprocessing.scala:59-74)."""


class MissingVectorCRSError(GeoprocessingError):
    """Vector present but its CRS missing (ErrorHandler.scala:11)."""


class MissingStreamLinesError(GeoprocessingError):
    """RasterLinesJoin without streamLines (Geoprocessing.scala:166-175)."""


class UnknownCRSError(GeoprocessingError):
    """CRS outside {LatLng, WebMercator, ConusAlbers} (Utils.scala:208-213)."""
