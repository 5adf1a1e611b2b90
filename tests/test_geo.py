"""Geo enrichment (J1/Q7) + IP predicate (F4/F5) semantics, the
broadcast plan pin, and the empty-document doc_stats contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsentinelai_spark.operators import geo

SF = "/root/testdata/sf0.01"


def _classify(spark, ips: list[str]):
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    return {
        r.ip: (r.valid, r.private)
        for r in df.select(
            "ip",
            F.expr(geo.VALID_SQL_SPARK).alias("valid"),
            F.expr(geo.PRIVATE_SQL).alias("private"),
        ).collect()
    }


def test_ip_predicates(spark):
    c = _classify(spark, [
        "8.8.8.8", "1.2.3.4", "223.255.255.254",   # public
        "10.0.0.1", "127.0.0.1", "192.168.1.1",     # private/loopback
        "172.16.0.1", "172.31.255.255", "169.254.0.1",
        "172.15.0.1", "172.32.0.1",                 # NOT in 172.16/12
        "300.1.2.3", "1.2.3", "host-42", "", "1.2.3.4.5",  # invalid
    ])
    for ip in ["8.8.8.8", "1.2.3.4", "223.255.255.254", "172.15.0.1", "172.32.0.1"]:
        assert c[ip] == (True, False), ip
    for ip in ["10.0.0.1", "127.0.0.1", "192.168.1.1", "172.16.0.1",
               "172.31.255.255", "169.254.0.1"]:
        assert c[ip][0] is True and c[ip][1] is True, ip
    for ip in ["300.1.2.3", "1.2.3", "host-42", "", "1.2.3.4.5"]:
        assert c[ip][0] is not True, ip  # False or NULL -> filtered


def test_geo_enrich_drops_non_public(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    with_ip = ev.select("event_id", F.expr(geo.IP_SYNTH_SQL).alias("ip"))
    enriched = geo.q_geo_enrich(spark, SF)
    out_ids = {r.event_id for r in enriched.select("event_id").collect()}
    # every synthesized invalid/private arm is absent from the output
    for r in with_ip.collect():
        first = r.ip.split(".")[0]
        if not first.isdigit() or int(first) in (10, 127) or r.ip.startswith("192.168."):
            assert r.event_id not in out_ids, r.ip
        if first.isdigit() and int(first) > 255:
            assert r.event_id not in out_ids, r.ip
    # enrichment struct is complete on every surviving row
    assert enriched.filter(
        F.col("country_code").isNull() | F.col("lat").isNull() | F.col("lon").isNull()
    ).count() == 0
    assert len(out_ids) > 0


def test_enrich_ips_production_plan_has_no_cache(spark):
    """The PRODUCTION operator (real ip column) must not pin the fact
    table: no InMemoryRelation anywhere in its plan (at 100 TB a cache
    here would try to pin the corpus), and the dimension lookup stays a
    broadcast hash join. The fixture wrapper's cache exists only for
    the synthesized-ip column."""
    events_ip = spark.createDataFrame(
        [(1, "8.8.8.8"), (2, "10.0.0.1"), (3, "200.1.2.3")],
        "event_id long, ip string",
    )
    df = geo.enrich_ips(events_ip, geo.geo_dim(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_dimension_is_range_keyed(spark):
    """CIDR-range semantics: two public ips in the SAME /8 but on
    opposite sides of a range boundary must enrich differently, and
    every public ip matches exactly one range (disjoint coverage).
    An octet-keyed point lookup could not produce this."""
    # 1.0.0.0 = 16777216; ranges are [j*2^22 + 2^21, ...): ip 1.32.0.0
    # (=18874368) sits in range j=4, ip 1.224.0.0 (=31457280) in j=7
    events_ip = spark.createDataFrame(
        [(1, "1.32.0.1"), (2, "1.224.0.1"), (3, "1.32.255.255")],
        "event_id long, ip string",
    )
    rows = {r.event_id: r for r in geo.enrich_ips(events_ip, geo.geo_dim(spark)).collect()}
    assert len(rows) == 3  # exactly-one-range coverage, nothing dropped
    assert (rows[1].country_code, rows[1].lat) == (rows[3].country_code, rows[3].lat)
    assert (rows[1].country_code, rows[1].lat, rows[1].lon) != (
        rows[2].country_code, rows[2].lat, rows[2].lon)


def test_range_dimension_straddles_octet_buckets(spark):
    """~1/4 of ranges straddle a /8 boundary (the offset construction);
    an ip just below and just above an octet boundary inside ONE range
    must enrich identically — this exercises the multi-bucket
    expansion of a single range."""
    # range j=3 covers [3*2^22+2^21, 4*2^22+2^21) = [14680064, 18874368)
    # which straddles 16777216 (=1.0.0.0): but 0.x ips are < octet 1 —
    # use a higher straddler: j=7 covers [31457280, 35651584) and
    # straddles 33554432 (=2.0.0.0).
    events_ip = spark.createDataFrame(
        [(1, "1.255.255.254"), (2, "2.0.0.1")],  # 33554430 and 33554433
        "event_id long, ip string",
    )
    rows = {r.event_id: r for r in geo.enrich_ips(events_ip, geo.geo_dim(spark)).collect()}
    assert len(rows) == 2
    assert (rows[1].country_code, rows[1].lat, rows[1].lon) == (
        rows[2].country_code, rows[2].lat, rows[2].lon)


def test_resolve_longest_prefix_flattens_nested_pair(spark):
    """A /14 nested inside a /10 must win exactly its own span; the
    parent keeps the flanks. The flatten output is disjoint."""
    dim = spark.createDataFrame(
        [
            (0, 1000, 1999, 10, "US", 1.0, 2.0),
            (1, 1200, 1299, 14, "KR", 3.0, 4.0),
        ],
        "range_id long, ip_lo long, ip_hi long, prefix_len int, "
        "country_code string, lat double, lon double",
    )
    flat = sorted(
        geo.resolve_longest_prefix(dim).collect(), key=lambda r: r.ip_lo)
    spans = [(r.ip_lo, r.ip_hi, r.country_code) for r in flat]
    assert spans == [
        (1000, 1199, "US"), (1200, 1299, "KR"), (1300, 1999, "US")]
    for a, b in zip(flat, flat[1:]):
        assert a.ip_hi < b.ip_lo  # disjoint


def test_resolve_longest_prefix_three_level_nesting(spark):
    """Grandparent /8 ⊃ parent /12 ⊃ child /16: every point resolves
    to its MOST specific cover, and the parent re-emerges on both
    flanks of the child (depth >2 pins the sweep's most-specific-first
    assignment, not just one nesting level)."""
    dim = spark.createDataFrame(
        [
            (0, 0, 99_999, 8, "US", 1.0, 1.0),
            (1, 10_000, 19_999, 12, "KR", 2.0, 2.0),
            (2, 14_000, 14_999, 16, "DE", 3.0, 3.0),
        ],
        "range_id long, ip_lo long, ip_hi long, prefix_len int, "
        "country_code string, lat double, lon double",
    )
    flat = sorted(
        geo.resolve_longest_prefix(dim).collect(), key=lambda r: r.ip_lo)
    spans = [(r.ip_lo, r.ip_hi, r.country_code) for r in flat]
    assert spans == [
        (0, 9_999, "US"),
        (10_000, 13_999, "KR"),
        (14_000, 14_999, "DE"),
        (15_000, 19_999, "KR"),
        (20_000, 99_999, "US"),
    ]


def test_enrich_ips_longest_prefix_nested_range(spark):
    """An ip inside a nested /14 enriches with the NESTED range's
    attributes; ips just outside (either flank, same base block) get
    the parent /10's. Exercises the reference's longest-prefix CIDR
    semantics (core/geoip.py:91-136) end-to-end."""
    # nested range_id 1025 sits in base block 16: [4.48.0.0, 4.51.255.255]
    events_ip = spark.createDataFrame(
        [(1, "4.48.0.1"), (2, "4.47.255.254"), (3, "4.52.0.1")],
        "event_id long, ip string",
    )
    rows = {r.event_id: r for r in geo.enrich_ips(events_ip, geo.geo_dim(spark)).collect()}
    assert len(rows) == 3
    # nested attrs: range_id 1025 -> country idx 1025%16=1 ("KR"),
    # lat (1025*37)%141-70+.5 = 67.5, lon (1025*73)%341-170+.5 = -23.5
    assert (rows[1].country_code, rows[1].lat, rows[1].lon) == ("KR", 67.5, -23.5)
    # flanks: parent block 16 -> country idx 0 ("US"), and identical to
    # each other (one parent range re-emerges on both sides)
    assert rows[2].country_code == rows[3].country_code == "US"
    assert (rows[2].lat, rows[2].lon) == (rows[3].lat, rows[3].lon)
    assert (rows[2].country_code, rows[2].lat) != (rows[1].country_code, rows[1].lat)


def test_enrich_ips_preserves_caller_octet1_ip_num_columns(spark):
    """A fact table that already carries `octet1` / `ip_num` columns
    must come back with THOSE values untouched (the operator's internal
    join keys use collision-proof __geo_* names)."""
    events_ip = spark.createDataFrame(
        [(1, "8.8.8.8", 99, -5), (2, "200.1.2.3", 42, -7)],
        "event_id long, ip string, octet1 int, ip_num long",
    )
    out = geo.enrich_ips(events_ip, geo.geo_dim(spark))
    assert out.columns == [
        "event_id", "ip", "octet1", "ip_num", "country_code", "lat", "lon"]
    rows = {r.event_id: r for r in out.collect()}
    assert (rows[1].octet1, rows[1].ip_num) == (99, -5)
    assert (rows[2].octet1, rows[2].ip_num) == (42, -7)
    assert rows[1].country_code is not None


def test_geo_join_is_broadcast(spark):
    """The dimension lookup must be a broadcast hash join: no shuffle
    of the event-fact side (at 100 TB a sort-merge join here would
    shuffle the whole corpus against a 256-row table)."""
    plan = geo.q_geo_enrich(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_geo_grid_totals(spark):
    grid = geo.q_geo_grid(spark, SF).collect()
    n_enriched = geo.q_geo_enrich(spark, SF).count()
    assert sum(r.n_events for r in grid) == n_enriched
    for r in grid:
        assert r.lat_cell % 10 == 0 and r.lon_cell % 10 == 0
        assert -90 <= r.lat_cell <= 90 and -180 <= r.lon_cell <= 180
        assert 1 <= r.n_ips <= r.n_events


def test_doc_stats_keeps_empty_docs(spark, tmp_path):
    """A zero-token document must appear with dl=0 in BOTH the Spark
    query and the DuckDB oracle (round-1 latent divergence)."""
    import duckdb

    from logsentinelai_spark.entry_queries import (
        q_doc_stats, q_global_stats, sql_doc_stats, sql_global_stats,
    )

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "...!!!"), (4, "one")],
        "doc_id long, text string",
    ).write.parquet(f"{p}/documents.parquet")

    srows = {r.doc_id: r.dl for r in q_doc_stats(spark, p).collect()}
    assert srows == {1: 2, 2: 0, 3: 0, 4: 1}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/documents.parquet/*.parquet')"
    )
    orows = dict(con.execute(sql_doc_stats()).fetchall())
    assert orows == srows

    sg = q_global_stats(spark, p).collect()[0]
    og = con.execute(sql_global_stats()).fetchall()[0]
    assert (sg.n_docs, sg.avgdl) == (og[0], og[1]) == (4, 0.75)
