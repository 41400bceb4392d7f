"""Pure-Python invariants of the oracle simulator (no Spark session)."""

from apollo_service_spark.oracle.simulator import SimConfig, simulate


def _tiny_pages():
    def page(links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return f"<html><body><div class='content'>{body}</div></body></html>"

    return {
        "https://a.com/": page(["https://a.com/x", "https://a.com/y", "https://b.com/"]),
        "https://a.com/x": page(["https://a.com/y", "https://a.com/z"]),
        "https://a.com/y": page(["https://a.com/"]),
        "https://a.com/z": page([]),
        "https://b.com/": page(["https://b.com/only"]),
        "https://b.com/only": None,  # non-HTML row
    }


def test_bfs_order_and_seen():
    res = simulate(_tiny_pages(), ["https://a.com/"], SimConfig(default_budget=10))
    log = [(r["iteration"], r["rank"], r["url"]) for r in res.crawl_log]
    assert log[0] == (0, 1, "https://a.com/")
    # iteration 1 fetches x, y and b.com root (rank by depth,url)
    it1 = [r for r in res.crawl_log if r["iteration"] == 1]
    assert [r["url"] for r in it1] == [
        "https://a.com/x", "https://a.com/y", "https://b.com/",
    ]
    assert res.seen == {
        "https://a.com/", "https://a.com/x", "https://a.com/y",
        "https://a.com/z", "https://b.com/", "https://b.com/only",
    }
    assert res.stopped_reason == "frontier_exhausted"


def test_budget_respected_per_host_per_iteration():
    res = simulate(
        _tiny_pages(), ["https://a.com/"], SimConfig(default_budget=1)
    )
    for it in range(res.iterations):
        per_host = {}
        for r in res.crawl_log:
            if r["iteration"] == it:
                per_host[r["host"]] = per_host.get(r["host"], 0) + 1
        assert all(v <= 1 for v in per_host.values())


def test_depth_limit_zero_fetches_only_seed():
    res = simulate(_tiny_pages(), ["https://a.com/"], SimConfig(depth_limit=0))
    assert res.seen == {"https://a.com/"}
    assert res.pages_fetched == 1


def test_domain_restriction():
    res = simulate(
        _tiny_pages(), ["https://a.com/"], SimConfig(base_host="a.com")
    )
    assert all(u.startswith("https://a.com/") for u in res.seen)


def test_max_pages_truncation_deterministic():
    a = simulate(_tiny_pages(), ["https://a.com/"], SimConfig(max_pages=3))
    b = simulate(_tiny_pages(), ["https://a.com/"], SimConfig(max_pages=3))
    assert a.crawl_log == b.crawl_log
    assert a.pages_fetched == 3
    assert a.stopped_reason == "max_pages"


def test_error_rows_not_counted_as_pages():
    pages = dict(_tiny_pages())
    del pages["https://a.com/z"]  # becomes a fetch miss
    res = simulate(pages, ["https://a.com/"], SimConfig())
    errors = [r for r in res.crawl_log if r["status"] == "error"]
    assert len(errors) == 1 and errors[0]["url"] == "https://a.com/z"
    assert res.pages_fetched == len(res.seen) - 1


def test_robots_block():
    res = simulate(
        _tiny_pages(),
        ["https://a.com/"],
        SimConfig(),
        robots={"a.com": ["/x"]},
    )
    assert "https://a.com/x" not in res.seen
    # /y and /z still reachable (z only via x → unreachable)
    assert "https://a.com/y" in res.seen
    assert "https://a.com/z" not in res.seen
