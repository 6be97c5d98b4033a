"""xmlconv transform (P5), entityconv (P7), parser chaining +
pluggable parsers (P8/P9)."""

from methanol_web_crawler_spark.functions.parsers import (
    entity_decode,
    register_parser,
    resolve_parser,
)
from methanol_web_crawler_spark.functions.xmlconv import html_to_xml
from methanol_web_crawler_spark.operators.admission import (
    extract_links_from_spans,
)


def T(kind="text", text=None, media=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media,
            "offset": offset}


class TestXmlconv:
    def test_doctype_comment_pi_dropped(self):
        x = html_to_xml(
            "<!DOCTYPE html><!-- c --><?xml foo?><html><p>x</p></html>"
        )
        assert "DOCTYPE" not in x and "<!--" not in x and "<?" not in x

    def test_lowercases_tags_and_attrs(self):
        x = html_to_xml('<HTML><A HREF="/x">t</A></HTML>')
        assert "<a href=" in x and "</a>" in x

    def test_amp_encoded(self):
        x = html_to_xml("<html><p>a &auml; b & c</p></html>")
        assert "&amp;auml;" in x and "&amp; c" in x

    def test_void_elements_self_closed(self):
        x = html_to_xml("<html><br><img src='/i.png'><hr></html>")
        assert "<br />" in x and "<hr />" in x
        assert "<img src='/i.png' />" in x

    def test_script_body_entity_encoded(self):
        x = html_to_xml("<html><script>if (a<b && c>d) {}</script></html>")
        assert "a&lt;b" in x and "&amp;&amp;" in x and "c&gt;d" in x
        assert "<script>" in x and "</script>" in x

    def test_misnested_auto_closed(self):
        x = html_to_xml("<html><b><i>x</b></i></html>")
        # closing </b> force-closes the open <i> first
        assert x.index("</i>") < x.index("</b>")

    def test_missing_html_wrapped(self):
        x = html_to_xml("<p>hello</p>")
        assert x.startswith("<html>") and x.endswith("</html>")

    def test_unclosed_tags_closed_at_end(self):
        x = html_to_xml("<html><div><p>x")
        assert x.endswith("</p></div></html>")

    def test_bare_attribute_valued(self):
        x = html_to_xml("<html><input disabled></html>")
        assert 'disabled="disabled"' in x


class TestEntityconv:
    def test_entities_decoded(self):
        assert entity_decode("a &amp; b &lt;c&gt; &auml;") == "a & b <c> ä"


class TestChaining:
    def test_transform_then_extract(self):
        # entityconv rewrites &#47; escapes so the html extractor sees
        # a real href afterwards
        body = '<a href="&#47;x.html">t</a>'
        spans = [T(text=body)]
        # without the transform, the href is the raw entity text
        links_plain = extract_links_from_spans(spans, ("html",))
        assert links_plain == ["&#47;x.html"]
        links_chained = extract_links_from_spans(
            spans, ("entityconv", "html")
        )
        assert links_chained == ["/x.html"]

    def test_pluggable_custom_parser(self):
        def my_parser(text):
            return [w for w in text.split() if w.startswith("LINK:")]

        register_parser("myp", lambda t: [
            w[5:] for w in t.split() if w.startswith("LINK:")
        ], "extract")
        assert resolve_parser("myp") is not None
        spans = [T(text="x LINK:/a.html y LINK:/b.html")]
        assert extract_links_from_spans(spans, ("myp",)) == [
            "/a.html", "/b.html",
        ]

    def test_unknown_parser_skipped(self):
        spans = [T(text="<a href='/x'>t</a>")]
        assert extract_links_from_spans(spans, ("nope", "html")) == ["/x"]

    def test_media_spans_always_candidates(self):
        spans = [T(kind="media", media="http://a.test/i.png", offset=0)]
        assert extract_links_from_spans(spans, ("html",)) == [
            "http://a.test/i.png"
        ]


class TestFtpListing:
    def test_unix_ls(self):
        from methanol_web_crawler_spark.functions.ftplist import (
            extract_ftp_links,
        )

        listing = (
            "drwxr-xr-x   2 ftp  ftp   4096 Jan 10 12:00 pub\n"
            "-rw-r--r--   1 ftp  ftp  10240 Jan 10  2024 file.tar.gz\n"
            "lrwxrwxrwx   1 ftp  ftp      7 Jan 10 12:00 latest -> pub\n"
            "garbage line\n"
        )
        assert extract_ftp_links(listing) == [
            "pub/", "file.tar.gz", "latest/",
        ]

    def test_eplf_and_msdos(self):
        from methanol_web_crawler_spark.functions.ftplist import (
            extract_ftp_links,
        )

        listing = (
            "+i8388621.48594,m825718503,r,s280,\tdjb.html\n"
            "+i8388621.50690,m824255907,/,\t514\n"
            "01-10-24  10:00AM       <DIR>          docs\n"
            "01-10-24  10:00AM              4096    readme.txt\n"
        )
        assert extract_ftp_links(listing) == [
            "djb.html", "514/", "docs/", "readme.txt",
        ]

    def test_ftp_chain_over_spans(self):
        spans = [T(text=(
            "drwxr-xr-x   2 ftp ftp 4096 Jan 10 12:00 sub\n"
            "-rw-r--r--   1 ftp ftp  100 Jan 10 12:00 a.txt\n"
        ))]
        assert extract_links_from_spans(spans, ("ftp",)) == [
            "sub/", "a.txt",
        ]
