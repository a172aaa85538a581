"""Golden-count reproduction on the REAL reference data (/root/reference/data).

The reference notebook's published run (docs/index.html, tabulated in
BASELINE.md) is the ground truth a user switching engines checks first:

  - df_initial   371 rows x 25 cols   (index.Rmd:73-119)
  - df_eurosea   256 rows x 21 cols   (index.Rmd:310-338)
  - df_combined  627 rows x 29 cols   (index.Rmd:346-376)
  - duplicate-identifier audit: 100 rows (index.Rmd:382-386)
  - users        218 rows x 6 cols    (index.Rmd:664-671)

Skipped when the reference data directory is absent (CI without the
checkout)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.pipelines import reference_config as cfg
from bioeco_portal_etl_spark.pipelines.programs import (
    combine,
    duplicate_identifier_report,
    ingest_contacts,
    ingest_eurosea,
    ingest_survey,
    users,
)
from bioeco_portal_etl_spark.sources.files import read_csv, read_excel

pytestmark = pytest.mark.skipif(
    not os.path.isdir(cfg.DATA_DIR), reason="reference data not present"
)


@pytest.fixture(scope="module")
def golden(spark):
    contacts = ingest_contacts(
        read_csv(spark, os.path.join(cfg.DATA_DIR, cfg.CONTACTS_CSV)),
        cfg.CONTACTS_PROJECTION,
    )
    initial = ingest_survey(
        read_csv(spark, os.path.join(cfg.DATA_DIR, cfg.SURVEY_CSV)),
        contacts,
        cfg.SURVEY_PROJECTION,
        abstract_col="name",
        source="initial",
    )
    eurosea = ingest_eurosea(
        read_excel(spark, os.path.join(cfg.DATA_DIR, cfg.EUROSEA_XLSX)),
        cfg.EUROSEA_PROJECTION,
        cfg.EUROSEA_FREQ_MAP,
        geometry="geojson",
        source="eurosea",
    )
    combined = combine(initial, eurosea)
    return {
        "initial": initial.persist(),
        "eurosea": eurosea.persist(),
        "combined": combined.persist(),
    }


def test_df_initial_dims(golden):
    initial = golden["initial"]
    assert initial.count() == 371
    assert len(initial.columns) == 25, sorted(initial.columns)


def test_df_eurosea_dims(golden):
    eurosea = golden["eurosea"]
    assert eurosea.count() == 256
    assert len(eurosea.columns) == 21, sorted(eurosea.columns)


def test_df_combined_dims(golden):
    combined = golden["combined"]
    assert combined.count() == 627
    assert len(combined.columns) == 29, sorted(combined.columns)
    # identifiers unique after make_unique (index.Rmd:393)
    assert combined.select("identifier").distinct().count() == 627


def test_duplicate_identifier_audit(golden):
    assert duplicate_identifier_report(golden["combined"]).count() == 100


def test_users_dims(golden):
    u = users(golden["combined"])
    assert u.count() == 218
    assert set(u.columns) == {
        "first_name",
        "last_name",
        "email",
        "username",
        "is_superuser",
        "pk",
    }
    pks = [r.pk for r in u.orderBy("pk").collect()]
    assert pks == list(range(2001, 2219))  # 2000 + row_number (index.Rmd:671)


def test_missing_spatial_count(golden):
    """The notebook's EP2 coverage bookkeeping, derived relationally:
    372 of 627 programs end up without spatial data (index.Rmd:569-575) —
    has_shapefile = homogeneous embedded GeoJSON OR an external spatial
    source keyed by program name."""
    from bioeco_portal_etl_spark.pipelines.layers import (
        with_has_shapefile_from_sources,
    )

    flagged = with_has_shapefile_from_sources(
        golden["combined"], cfg.EXTERNAL_LAYER_NAMES
    )
    assert flagged.filter(~F.col("has_shapefile")).count() == 372
    assert flagged.count() == 627


def test_real_layers_write_end_to_end(golden, tmp_path):
    """EP2 on the real data: the 220 GeoJSON-eligible programs (96 bare
    Point/MultiPoint from EuroSea + 124 homogeneous FeatureCollections
    from the contacts survey) each materialize a readable shapefile layer
    via the distributed grouped write."""
    import os

    from bioeco_portal_etl_spark.geo.shapefile import read_shapefile
    from bioeco_portal_etl_spark.pipelines.layers import (
        layer_eligible_identifiers,
        layer_table_from_geojson,
        write_layers,
    )

    combined = golden["combined"]
    eligible = layer_eligible_identifiers(combined)
    assert eligible.count() == 220
    layers = layer_table_from_geojson(
        combined.join(eligible, "identifier", "left_semi")
    )
    out = str(tmp_path / "output")
    write_layers(layers, out)
    dirs = sorted(os.listdir(out))
    assert len(dirs) == 220
    # spot-read one layer back: valid shapefile, homogeneous geometry
    ident = dirs[0]
    feats = read_shapefile(os.path.join(out, ident, ident))
    assert feats
    types = {f[0].split(" ")[0].split("(")[0] for f in feats}
    assert len(types) == 1


def test_initial_spot_values(golden):
    """First published row (docs/index.html): Abundance… 2003-01-01 /
    quarterly; ACCOBAMS row: ASI, 2018-01-01..2018-12-31, sub_daily."""
    by = {
        r["name"]: r
        for r in golden["initial"]
        .filter(F.col("name").startswith("ACCOBAMS"))
        .collect()
    }
    assert by, "ACCOBAMS row missing"
    r = next(iter(by.values()))
    assert r.abbreviation == "ASI"
    assert str(r.start_date) == "2018-01-01"
    assert str(r.end_date) == "2018-12-31"
    assert r.temporal_resolution == "sub_daily"


def test_keywords_flow_on_real_backup_csv(spark):
    """The eov_to_keywords companion flow over the REAL JDBC-backup CSV
    (data/layers_layer_eovs.csv, 1440 links): with a vocabulary covering
    the 12 EOV short names, every link resolves; reference-exact mode
    (keep_unmatched) preserves the full 1440-row left join."""
    from bioeco_portal_etl_spark.pipelines.keywords import eov_keyword_links

    links = read_csv(
        spark, os.path.join(cfg.DATA_DIR, "layers_layer_eovs.csv"),
        multi_line=False,
    )
    assert links.count() == 1440
    shorts = [r.short_name for r in links.select("short_name").distinct().collect()]
    tk = spark.createDataFrame(
        [(100 + i, s, "https://goosocean.org/vocab") for i, s in enumerate(sorted(shorts))],
        "id long, alt_label string, about string",
    )
    resolved = eov_keyword_links(links, tk)
    exact = eov_keyword_links(links, tk, keep_unmatched=True)
    assert exact.count() == 1440  # reference left-join semantics
    assert resolved.count() == links.select("layer_id", "short_name").distinct().count()
    assert resolved.filter(F.col("tkeyword_id").isNull()).count() == 0
