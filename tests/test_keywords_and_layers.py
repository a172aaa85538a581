"""EP2 geojson->layer-table composition and the eov_to_keywords companion
flow (SURVEY.md §3)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.geo.shapefile import read_shapefile
from bioeco_portal_etl_spark.geo.wkt import geom_type
from bioeco_portal_etl_spark.pipelines.keywords import eov_keyword_links
from bioeco_portal_etl_spark.pipelines.layers import (
    layer_table_from_geojson,
    with_has_shapefile,
    write_layers,
)


def _fc(*geoms):
    return json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "properties": {}, "geometry": g} for g in geoms
            ],
        }
    )


def test_geojson_to_layers_end_to_end(spark, tmp_path):
    programs = spark.createDataFrame(
        [
            ("prog_pt", _fc({"type": "Point", "coordinates": [1.5, 2.5]})),
            (
                "prog_poly",
                _fc(
                    {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]},
                    {"type": "Polygon", "coordinates": [[[5, 5], [6, 5], [6, 6], [5, 5]]]},
                ),
            ),
            ("prog_none", None),
            ("prog_null", "null"),
        ],
        "identifier string, geometry_geojson string",
    )
    layers = layer_table_from_geojson(programs)
    rows = {(r.identifier, r.geometry_wkt) for r in layers.collect()}
    assert rows == {
        ("prog_pt", "POINT (1.5 2.5)"),
        ("prog_poly", "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
        ("prog_poly", "POLYGON ((5 5, 6 5, 6 6, 5 5))"),
    }

    # A5 homogeneity check composes on the layer table
    homo = layers.groupBy("identifier").agg(
        F.countDistinct(geom_type("geometry_wkt")).alias("n_types")
    )
    assert all(r.n_types == 1 for r in homo.collect())

    out = str(tmp_path / "layers")
    write_layers(layers, out)
    flagged = with_has_shapefile(programs, layers)
    flags = {r.identifier: r.has_shapefile for r in flagged.collect()}
    assert flags == {
        "prog_pt": True, "prog_poly": True, "prog_none": False, "prog_null": False,
    }
    back = read_shapefile(os.path.join(out, "prog_poly", "prog_poly"))
    assert len(back) == 2 and all(w.startswith("POLYGON") for w, _ in back)


def test_eov_keyword_links(spark):
    links = spark.createDataFrame(
        [(11, "phytoplankton"), (11, "seagrass"), (12, "phytoplankton"), (13, "unmapped")],
        "layer_id int, short_name string",
    )
    tkeywords = spark.createDataFrame(
        [
            (1, "phytoplankton", "https://vocab.nerc.ac.uk/goosocean/1"),
            (2, "seagrass", "https://vocab.nerc.ac.uk/goosocean/2"),
            (3, "phytoplankton", "https://other.vocab/xx"),  # filtered by F4
        ],
        "id int, alt_label string, about string",
    )
    out = eov_keyword_links(links, tkeywords)
    rows = {(r.resourcebase_id, r.tkeyword_id) for r in out.collect()}
    assert rows == {(11, 1), (11, 2), (12, 1)}
