"""Batch-78 parser invariants beyond the oracle: prefix-match boundary
(/item blocks the query URL but /art does NOT block /article unless the
rule says so — robotparser is prefix-based, pinned explicitly), UA-section
selection, and crawl_delay extraction."""

import pytest

from omni_ray.pipelines.robotsops import _robots_txt
from omni_ray.state.robots import parse_robots


def test_prefix_match_boundary():
    rp = parse_robots(_robots_txt(0))  # even hid: /tag/ and /item disallowed
    assert not rp.can_fetch("omni-ray", "https://h.test/item?id=3&ref=s")
    assert not rp.can_fetch("omni-ray", "https://h.test/tag/s/page/5")
    assert rp.can_fetch("omni-ray", "https://h.test/article/5")
    assert rp.can_fetch("omni-ray", "https://h.test/2021/03/post-7.html")
    # odd hid: everything allowed
    rp1 = parse_robots(_robots_txt(1))
    assert rp1.can_fetch("omni-ray", "https://h.test/item?id=3")


def test_ua_section_selection():
    rp = parse_robots(_robots_txt(0, ua_sections=True))
    # named agent gets ITS section (blocks /article/), not the * section
    assert not rp.can_fetch("omni-ray", "https://h.test/article/5")
    assert rp.can_fetch("omni-ray", "https://h.test/tag/s/page/5")
    # generic agent gets the * section (blocks /tag/)
    assert rp.can_fetch("genericbot", "https://h.test/article/5")
    assert not rp.can_fetch("genericbot", "https://h.test/tag/s/page/5")


def test_crawl_delay_rotation():
    assert parse_robots(_robots_txt(0)).crawl_delay("omni-ray") is None
    assert parse_robots(_robots_txt(1)).crawl_delay("omni-ray") == 1
    assert parse_robots(_robots_txt(2)).crawl_delay("omni-ray") == 5
