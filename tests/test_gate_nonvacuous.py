"""Round-8 regression lock for the scale-parameter trap class
(PORTABILITY.md "Scale-dependence of gate parameters").

The full-catalog oracle sweeps at sf0.001 and sf0.1 found six entries
whose gate rows hash-matched EMPTY-vs-empty at one end of the SF range —
fixed fractions (q11), absolute per-group thresholds (q20, x35),
hardcoded dimension members (q7, q20), a k-core k above the smallest
graph's max clique (gr8), and a frozen oracle missing an SF branch
(ts4). All were retuned data-relative in round 8; this test pins the
retune by asserting each produces ROWS at the smallest SF, where the
originals were vacuous. (Cross-engine value equality is the oracle
suite's job; this guards only against the cut collapsing again.)

The sf0.1 end is covered by the once-per-round sweep
(scripts/validate.py --sf-dir /root/testdata/sf0.1) — too slow for the
unit suite.
"""

from __future__ import annotations

import pytest

from bioeco_portal_etl_spark import catalog

SF_SMALL = "/root/testdata/sf0.001"

RETUNED = [
    "q7_volume_shipping",
    "q11_value_suppliers",
    "q20_part_stock_chain",
    "x35_market_basket",
    "gr8_kcore",
    "ts4_kmeans_ivf",
]


@pytest.mark.parametrize("name", RETUNED)
def test_retuned_entry_nonempty_at_smallest_sf(spark, name):
    df = catalog.queries()[name](spark, SF_SMALL)
    assert df.limit(1).count() > 0, (
        f"{name} returned no rows at sf0.001 — its gate comparison is "
        "vacuous again (see PORTABILITY.md scale-parameter section)"
    )
