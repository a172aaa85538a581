"""The reference deployment's configuration, as data (notebooks/index.Rmd).

Everything here is WHAT the reference pipeline computes — column
projections, recode tables, level orderings — transcribed from the
notebook's inline constants so `pipelines/programs.py` (the engine) can
reproduce the published run on `/root/reference/data/`. The published run
(docs/index.html: df_initial 371×25) predates the notebook's later
in_obis/interest_obis additions, so those two columns are intentionally
absent from SURVEY_PROJECTION; add them back for the current-notebook
variant (index.Rmd:95-96).

Sources:
  - CONTACTS_PROJECTION  -> index.Rmd:56-65
  - SURVEY_PROJECTION    -> index.Rmd:73-97
  - INITIAL_FREQ_MAP     -> index.Rmd:105-117 (re-exported from programs)
  - EUROSEA_PROJECTION   -> index.Rmd:137-160 (raw xlsx headers, not R's
    dot-mangled names)
  - EUROSEA_FREQ_MAP     -> index.Rmd:192-271
  - FREQUENCY_LEVELS     -> index.Rmd:297-308 (re-exported from programs)
"""

from __future__ import annotations

from bioeco_portal_etl_spark.pipelines.programs import (  # noqa: F401
    FREQUENCY_LEVELS,
    INITIAL_FREQ_MAP,
)

DATA_DIR = "/root/reference/data"
CONTACTS_CSV = "2InfoDataProviderswoSpatialInfo_Final_420_7302020_FINAL_toshare.csv"
SURVEY_CSV = "4Updated_Spatial_Survey_420_8132020_FINAL_toshare.csv"
EUROSEA_XLSX = "EuroSea.xlsx"

CONTACTS_PROJECTION = {
    "prog_name": "name",
    "resp_firstname": "contact_firstname",
    "resp_lastname": "contact_lastname",
    "resp_email": "contact_email",
    "ErinSpatialGeoJSON": "geometry_geojson",
}

SURVEY_PROJECTION = {
    "prog_name": "name",
    "prog_abbrev": "abbreviation",
    "prog_url": "url",
    "duration_start_year": "start_year",
    "duration_end_year": "end_year",
    "freq_interval": "frequency",
    "Birds": "eov_birds",
    "Hard_Coral": "eov_hardcoral",
    "Fish": "eov_fish",
    "Macroalgae": "eov_macroalgae",
    "Mangroves": "eov_mangroves",
    "Microbes": "eov_microbes",
    "Ocean_Sound": "eov_oceansound",
    "Phytoplankton": "eov_phytoplankton",
    "Seagrass": "eov_seagrass",
    "Sea_Turtles": "eov_seaturtles",
    "Zooplankton": "eov_zooplankton",
    "Benthic_Invertebrate": "eov_benthicinvertebrates",
    "Marine_Mammals": "eov_mammals",
}

EUROSEA_PROJECTION = {
    "Organisation": "organization",
    "Program name": "name",
    "Time period": "time_period",
    "Frequency": "frequency",
    "Birds": "eov_birds",
    "Hard coral": "eov_hardcoral",
    "Fish": "eov_fish",
    "Macroalgae": "eov_macroalgae",
    "Mangrove": "eov_mangroves",
    "Microbes": "eov_microbes",
    "Phytoplankton": "eov_phytoplankton",
    "Seagrass": "eov_seagrass",
    "Turtles": "eov_seaturtles",
    "Zooplankton": "eov_zooplankton",
    "Benthic invertebrates": "eov_benthicinvertebrates",
    "Mammals": "eov_mammals",
    "Website": "url",
    "Lat": "lat",
    "Lon": "lon",
}

# Programs whose spatial layer comes from an EXTERNAL source rather than the
# embedded GeoJSON column — the reference's imperative shapefile_from_points /
# gather_shapefiles / copy_shapefile / TSV / XLSX call sites, keyed by program
# name (index.Rmd:443-462, 486, 505, 513-520, 526, 542).
EXTERNAL_LAYER_NAMES = [
    "Aleutian Islands Benthic Habitat Survey",
    "Australian continuous plankton recorder survey (AusCPR)",
    "Cetacean Research Program",
    "Diversity of the Indo-Pacific Network",
    "eOceans",
    "Estacion Costera de Investigaciones Marinas",
    "Estación de Fotobiologia Playa Unión",
    "Global ARMS Program",
    "IMOS ships of opportunity bioacoustics",
    "Marine Biodiversity and Climate Change",
    "Movebank",
    "National Observatory System: Mammals as Ocean Samplers",
    "Ocean Tracking Network",
    "Reef Life Survey",
    "SCAR Southern Ocean Continuous Plankton Recorder Survey",
    "Service National d'Observation CORAIL",
    "Synoptic Intertidal Benthic Survey",
    "Tohoku National Fisheries Institute",
    "Waddenmozaiek program",
    "Zooplankton Sample Collectionof Fisheries Research Agency",
    "Ecological impact monitoring offshore windfarms",
    "IUCN Marine Mammal Protected Areas Task Force",
    "Marine breeding birds",
    "Coastal waters soft bottom fauna",
    "Abundance and distribution of harbour porpoises",
    "Coastal hard bottom macroalgae and blue mussel communities",
    "Offshore soft bottom macrozoobenthos",
    "Phytoplankton species composition and abundance",
    "Sea trout",
    "Zooplankton species composition and abundance",
    "Basque monitoring network for the ecological status assessment",
    "Western European Shelf Pelagic Acoustic Survey (WESPAS)",
]

EUROSEA_FREQ_MAP = {
    "2 x a week since 2005": "weekly",
    "Annual (Sept)": "annually",
    "Annual (Aug - Sept)": "annually",
    "2x per year": "twice_per_year",
    "Continually": "sub_daily",
    "Annual": "annually",
    "Monthly": "monthly",
    "Daily": "daily",
    "Quarterly": "quarterly",
    "Spring/Summer": "twice_per_year",
    "Once in 3 years": "every_2_to_5_years",
    "Once in 6 years": "every_6_to_10_years",
    "4x per year": "quarterly",
    "Once in 2 years": "every_2_to_5_years",
    "Varies": "opportunistically",
    "Every 6 months": "twice_per_year",
    "A": "annually",
    "Annually in May": "annually",
    "Annually": "annually",
    "Annually in March/April": "annually",
    "Annually in July/August": "annually",
    "6-8y interval (1987, 1989, 1995, 2001, 2007,2015)": "every_6_to_10_years",
    "Annually in March": "annually",
    "Annually in August": "annually",
    "Annually in September": "annually",
    "Every 3 years": "every_2_to_5_years",
    "1x per year": "annually",
    "weekly": "weekly",
    "2x per month": "monthly",
    "4x per month": "weekly",
    "1x per month": "monthly",
    "Year round": "opportunistically",
    "Seasonal": "quarterly",
    "10 minutes": "sub_daily",
    "Seconds": "sub_daily",
    "Once per summer (cruise) + autonomous instruments throughout the year": "sub_daily",
    "Annual or Seasonal": "annually",
    "Weekly": "weekly",
    "Monthly to biannually": "opportunistically",
    "May and June ": "twice_per_year",
    "Monthly to bimonthly": "monthly",
    "Seasonally": "quarterly",
    "Weekly from May to October": "opportunistically",
    "June-Sept": "opportunistically",
    "Summer": "annually",
    "weekly or bi-weekly ": "weekly",
    "All year round but mostly from April to October": "opportunistically",
    "8-10x month": "weekly",
    "March - November": "opportunistically",
    "once in 2 years": "every_2_to_5_years",
    "once prt year": "annually",
    "once in 6 year period": "every_6_to_10_years",
    "Every 3 months": "quarterly",
    "Every 2 years": "every_2_to_5_years",
    "Once a month": "monthly",
    "April - October (weather dependent)": "opportunistically",
    "Once per summer": "annually",
    "Varies/Daily ": "opportunistically",
    "4 - 10 times a year": "quarterly",
    "3 - 6 times a year": "quarterly",
    "3 - 4 times a year": "quarterly",
    "Twice a month": "monthly",
    "Opportunistic": "opportunistically",
    "4 times a year": "quarterly",
    "Every 10 days in spring/summer and monthy in winter": "monthly",
    "Annualy": "annually",
    "4 per year (1 per season)": "quarterly",
    "6-8 x per year (1 mission of 2 months length approx.)": "quarterly",
    "4 x per year": "quarterly",
    "24 x per year": "monthly",
    "10x per year": "monthly",
    "Planned with 3 years intervals": "every_2_to_5_years",
    "Biannual": "every_2_to_5_years",
    "Annual/Biannual": "every_2_to_5_years",
    "2-4 times per year": "annually",
    "Bi-monthly": "monthly",
    "2 weekly / monthly": "monthly",
}
