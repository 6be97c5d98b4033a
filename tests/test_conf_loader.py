"""`.conf` loader tests: grammar, reference quirks, fixture loading,
and one golden crawl driven by a reference conf file."""

import os

import pytest

from methanol_web_crawler_spark.config_loader import (
    ConfError,
    ConfLoader,
    load_config,
)

REF_CONF = "/root/reference/conf"
have_ref = pytest.mark.skipif(
    not os.path.isdir(REF_CONF), reason="reference conf dir absent"
)


def _build(text):
    return ConfLoader((REF_CONF,)).load_string(text)


class TestGrammar:
    def test_basic_objects(self):
        l = _build("""
        # line comment
        crawler ["c"] { depth_limit = 3; robotstxt = true; }
        filetype ["f"] {
            extensions = {"a", "b"};
            parser = "html, entityconv";  /* c comment */
        }
        """)
        cfg = l.build()
        assert cfg.crawler("c").depth_limit == 3
        assert cfg.crawler("c").robotstxt is True
        assert cfg.filetype("f").extensions == ("a", "b")
        assert cfg.filetype("f").parsers == ("html", "entityconv")

    def test_default_crawler_gets_all_filetypes_in_order(self):
        cfg = _build("""
        crawler ["c"] { }
        filetype ["x"] { }
        filetype ["y"] { }
        """).build()
        # metha.c:1022-1031
        assert cfg.crawler("c").filetypes == ("x", "y")

    def test_reference_defaults(self):
        cfg = _build('crawler ["c"] { }').build()
        c = cfg.crawler("c")
        assert c.depth_limit == 1  # crawler.c:47
        assert c.peek_limit == 0
        assert c.dynamic_url == "lookup"  # metha.c:1152-1157

    def test_extend(self):
        cfg = _build("""
        filetype ["f"] { extensions = {"a"}; parser = "html"; }
        extend: filetype ["f"] { extensions = {"b"}; }
        """).build()
        f = cfg.filetype("f")
        assert f.extensions == ("b",)
        assert f.parsers == ("html",)  # untouched by extend

    def test_extend_undefined_errors(self):
        with pytest.raises(ConfError, match="undefined filetype"):
            _build('extend: filetype ["nope"] { }')

    def test_override_clears_but_keeps_handler(self):
        # lm_filetype_clear never touches handler (filetype.c:75-114)
        cfg = _build("""
        filetype ["f"] { extensions = {"a"}; handler = "writefile"; }
        override: filetype ["f"] { mimetypes = {"x/y"}; }
        """).build()
        f = cfg.filetype("f")
        assert f.extensions == ()
        assert f.mimetypes == ("x/y",)
        assert f.handler == "writefile"

    def test_crawler_override_keeps_bindings(self):
        # lm_crawler_clear leaves the five URL bindings (crawler.c:114)
        cfg = _build("""
        crawler ["c"] { dynamic_url = "discard"; depth_limit = 9; }
        override: crawler ["c"] { }
        """).build()
        c = cfg.crawler("c")
        assert c.dynamic_url == "discard"
        assert c.depth_limit == 1  # reset by clear

    def test_copy_drops_parser(self):
        # lm_filetype_dup copies everything except parser_str
        # (filetype.c:117-163: only the not-yet-built parser_chain)
        cfg = _build("""
        filetype ["src"] { extensions = {"e"}; parser = "html"; }
        filetype ["dst" copy "src"] { }
        """).build()
        assert cfg.filetype("dst").extensions == ("e",)
        assert cfg.filetype("dst").parsers == ()

    def test_crawler_copy_keeps_depth_limit(self):
        # lm_crawler_dup does not copy depth_limit (crawler.c:66-107)
        cfg = _build("""
        crawler ["a"] { depth_limit = 7; external_peek = 4; }
        crawler ["b" copy "a"] { }
        """).build()
        b = cfg.crawler("b")
        assert b.depth_limit == 1
        assert b.peek_limit == 4

    def test_copy_with_explicit_override_after(self):
        cfg = _build("""
        filetype ["src"] { extensions = {"e1", "e2"}; }
        filetype ["dst" copy "src"] { extensions = {"e3"}; }
        """).build()
        assert cfg.filetype("dst").extensions == ("e3",)

    def test_prefix_class_match_quirk(self):
        # conf.c:341 strncmp(token, class, token_len): "file" matches
        # class "filetype"
        cfg = _build('file ["f"] { extensions = {"a"}; }').build()
        assert cfg.filetype("f").extensions == ("a",)

    def test_semicolon_form_drops_new_object(self):
        # add_cb only runs at '}' (conf.c:552-566)
        l = _build("""
        filetype ["ghost"];
        filetype ["real"] { }
        """)
        assert [f.name for f in l.filetypes] == ["real"]

    def test_semicolon_form_leaks_extend_flag(self):
        # extend/override reset only at '}' (conf.c:567-569): after an
        # override-; the NEXT plain definition behaves as extend+override
        l = _build("""
        filetype ["a"] { extensions = {"x"}; }
        filetype ["b"] { extensions = {"y"}; }
        override: filetype ["a" copy "b"];
        filetype ["b"] { mimetypes = {"m/n"}; }
        """)
        cfg = l.build()
        assert cfg.filetype("a").extensions == ("y",)
        # "b" was overridden in place, not redefined/duplicated
        assert [f.name for f in l.filetypes] == ["a", "b"]
        assert cfg.filetype("b").extensions == ()
        assert cfg.filetype("b").mimetypes == ("m/n",)

    def test_flag_false_is_noop(self):
        # conf.c:702-703 "TODO: set flag to 0"
        cfg = _build("""
        crawler ["c"] { robotstxt = true; }
        extend: crawler ["c"] { robotstxt = false; }
        """).build()
        assert cfg.crawler("c").robotstxt is True

    def test_flag_from_digit(self):
        cfg = _build('crawler ["c"] { jail = 1; external = 0; }').build()
        assert cfg.crawler("c").jail is True
        assert cfg.crawler("c").external is False

    def test_unknown_option_errors(self):
        with pytest.raises(ConfError, match="unknown option 'bogus'"):
            _build('filetype ["f"] { bogus = "x"; }')

    def test_type_mismatch_errors(self):
        with pytest.raises(ConfError, match="expects"):
            _build('filetype ["f"] { extensions = "notarray"; }')

    def test_unterminated_string(self):
        with pytest.raises(ConfError, match="unterminated"):
            _build('filetype ["f] { }')

    def test_load_module_recorded(self):
        l = _build('load_module "libsomething.so"\nfiletype["f"]{}')
        assert l.modules == ["libsomething.so"]


@have_ref
class TestReferenceFixtures:
    FIXTURES = [
        "default.conf", "css.conf", "image.conf", "audio.conf",
        "video.conf", "archive.conf", "feed.conf", "ftp.conf",
        "title.conf", "meta.conf", "google.conf", "wikipedia.conf",
        "youtube.conf", "validate.conf", "source.conf",
        "xmlsource.conf",
    ]

    @pytest.mark.parametrize("fname", FIXTURES)
    def test_loads(self, fname):
        cfg = load_config(
            os.path.join(REF_CONF, fname), conf_dirs=(REF_CONF,)
        )
        assert cfg.filetypes or cfg.crawlers

    def test_default_conf_shape(self):
        cfg = load_config(
            os.path.join(REF_CONF, "default.conf"), conf_dirs=(REF_CONF,)
        )
        html = cfg.filetype("html")
        assert html.extensions == (
            "htm", "html", "php", "asp", "aspx", "jsp"
        )
        assert html.mimetypes == (
            "text/html", "text/xml", "application/xhtml+xml",
            "application/xml",
        )
        assert html.parsers == ("html",)
        c = cfg.crawler("default")
        assert c.dir_url == "@html"
        assert c.extless_url == "@html"
        assert c.dynamic_url == "@html"
        assert c.unknown_url == "discard"
        assert c.ftp_dir_url == "lookup"
        assert c.filetypes == ("html", "text")

    def test_title_conf_extends_html_parser(self):
        cfg = load_config(
            os.path.join(REF_CONF, "title.conf"), conf_dirs=(REF_CONF,)
        )
        assert cfg.filetype("html").parsers == (
            "xmlconv", "misc.js/title"
        )
        # extend keeps extensions from default.conf
        assert "php" in cfg.filetype("html").extensions

    def test_image_conf_double_include(self):
        cfg = load_config(
            os.path.join(REF_CONF, "image.conf"), conf_dirs=(REF_CONF,)
        )
        assert [f.name for f in cfg.filetypes] == [
            "html", "text", "css", "image"
        ]
        assert cfg.filetype("image").mimetypes == ("image/",)

    def test_google_conf(self):
        cfg = load_config(
            os.path.join(REF_CONF, "google.conf"), conf_dirs=(REF_CONF,)
        )
        c = cfg.crawler("default")
        assert c.filetypes == ("html", "result")
        assert cfg.filetype("html").expr == "PATH</search?*q=*start=*>"
        assert cfg.filetype("result").expr == "FULL<*>"
        assert cfg.filetype("result").is_target_only


@have_ref
class TestConfDrivenCrawl:
    """Golden parity: engine vs pure-Python oracle under a config
    loaded from the reference's own conf file."""

    def test_title_conf_crawl(self, spark, tmp_path):
        from methanol_web_crawler_spark.config import (
            CrawlConfig,
            Filetype,
        )
        from methanol_web_crawler_spark.oracle.crawler import (
            OracleCrawler,
        )
        from methanol_web_crawler_spark.plans.crawl import SparkCrawler
        from methanol_web_crawler_spark.sources.synthweb import (
            generate_web,
        )

        cfg = load_config(
            os.path.join(REF_CONF, "title.conf"), conf_dirs=(REF_CONF,)
        )
        # declared attributes are the engine's data path for the
        # reference's stdout prints (P11) — declare to observe them
        fts = tuple(
            Filetype(
                name=f.name, extensions=f.extensions,
                mimetypes=f.mimetypes, expr=f.expr, parsers=f.parsers,
                handler=f.handler,
                attributes=("title",) if f.name == "html"
                else f.attributes,
                switch_to=f.switch_to, ignore_host=f.ignore_host,
            )
            for f in cfg.filetypes
        )
        cfg = CrawlConfig(filetypes=fts, crawlers=cfg.crawlers)
        cfg.validate()

        web = generate_web(n_docs=120, n_hosts=4, seed=11)
        oracle = OracleCrawler(
            web.doc_map, cfg, politeness_budget=0
        ).run(web.seeds)

        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, politeness_budget=0,
            state_dir=str(tmp_path / "title_conf"),
        )
        stats = engine.run(web.seeds)

        assert stats.fetched == len(oracle.fetched_urls)
        engine_seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert engine_seen == oracle.seen
        want = sorted(
            (t.url, tuple(sorted(t.attributes.items())))
            for t in oracle.targets
            if t.attributes
        )
        tdf = engine.store.table("attr_targets").read_until(spark)
        got = sorted(
            (r["url"], tuple(sorted(r["attributes"].items())))
            for r in (tdf.collect() if tdf is not None else [])
        )
        assert got == want
