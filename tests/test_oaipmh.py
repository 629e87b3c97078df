"""OAI-PMH harvest queue: protocol conformance against a fake endpoint
(request URLs, resumptionToken paging, deleted headers, error codes)
and the harvest→decode Ray composition."""

import urllib.parse

import pytest

from limetrans_ray.sources.oaipmh import (
    OaiPmhError,
    build_url,
    harvest,
    harvest_dataset,
)

OAI = "http://www.openarchives.org/OAI/2.0/"
MARC = "http://www.loc.gov/MARC21/slim"


def _marc(ident, title):
    return (
        f'<record xmlns="{MARC}">'
        f'<controlfield tag="001">{ident}</controlfield>'
        f'<datafield tag="245" ind1="1" ind2="0">'
        f'<subfield code="a">{title}</subfield></datafield></record>'
    )


def _page(records, token=None):
    recs = "".join(records)
    tok = f"<resumptionToken>{token}</resumptionToken>" if token else ""
    return (
        f'<?xml version="1.0"?><OAI-PMH xmlns="{OAI}">'
        f"<responseDate>2024-01-01T00:00:00Z</responseDate>"
        f"<ListRecords>{recs}{tok}</ListRecords></OAI-PMH>"
    )


def _rec(ident, title, deleted=False):
    status = ' status="deleted"' if deleted else ""
    meta = "" if deleted else f"<metadata>{_marc(ident, title)}</metadata>"
    return (
        f"<record><header{status}><identifier>oai:test:{ident}</identifier>"
        f"<datestamp>2024-01-01</datestamp></header>{meta}</record>"
    )


class FakeEndpoint:
    """Two pages + a deleted record; records every request URL."""

    def __init__(self):
        self.urls = []
        self.pages = {
            None: _page([_rec("HT001", "Erste"), _rec("HT002", "Zweite", deleted=True)], token="t1"),
            "t1": _page([_rec("HT003", "Dritte")]),
        }

    def __call__(self, url):
        self.urls.append(url)
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
        assert q["verb"] == "ListRecords"
        return self.pages[q.get("resumptionToken")]


def test_build_url_token_exclusive():
    u = build_url("http://x/oai", metadata_prefix="marcxml",
                  date_from="2024-01-01", set_spec="hbz")
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(u).query))
    assert q == {"verb": "ListRecords", "metadataPrefix": "marcxml",
                 "from": "2024-01-01", "set": "hbz"}
    u2 = build_url("http://x/oai", resumption_token="abc")
    q2 = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(u2).query))
    assert q2 == {"verb": "ListRecords", "resumptionToken": "abc"}


def test_harvest_pages_and_deleted():
    ep = FakeEndpoint()
    recs = list(harvest("http://x/oai", ep, set_spec="hbz"))
    assert [r.identifier for r in recs] == [
        "oai:test:HT001", "oai:test:HT002", "oai:test:HT003"]
    assert [r.deleted for r in recs] == [False, True, False]
    assert recs[1].xml is None
    assert "HT003" in recs[2].xml
    # first request carries the selective args, the follow-up ONLY the token
    assert "set=hbz" in ep.urls[0] and "resumptionToken" not in ep.urls[0]
    assert "resumptionToken=t1" in ep.urls[1] and "set=" not in ep.urls[1]


def test_error_and_loop_guard():
    def err_fetch(url):
        return ('<OAI-PMH xmlns="%s"><error code="badResumptionToken">'
                "expired</error></OAI-PMH>" % OAI)

    with pytest.raises(OaiPmhError, match="badResumptionToken"):
        list(harvest("http://x/oai", err_fetch))

    def none_fetch(url):
        return ('<OAI-PMH xmlns="%s"><error code="noRecordsMatch">'
                "none</error></OAI-PMH>" % OAI)

    assert list(harvest("http://x/oai", none_fetch)) == []

    def loop_fetch(url):
        return _page([_rec("X", "T")], token="same")

    with pytest.raises(OaiPmhError, match="loop"):
        list(harvest("http://x/oai", loop_fetch))


def test_harvest_dataset_decodes(ray_session):
    ds, deleted = harvest_dataset("http://x/oai", FakeEndpoint())
    out = ds.to_pandas()
    assert deleted == ["oai:test:HT002"]
    assert set(out["record_id"]) == {"HT001", "HT003"}
    titles = out[(out["field"] == "24510") & (out["subfield"] == "a")]
    assert sorted(titles["value"]) == ["Dritte", "Erste"]
