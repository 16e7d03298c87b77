"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

One HTML archetype per reference sample/benchmark case family
(``sample/{basic,flowchart,gantt_chart,forms_with_many_merged_cells,
formula,smartart}`` + benchmark manifest, SURVEY.md §5).  Generation is a
pure function of ``(seed, doc_id)`` — independent of partitioning, batch
order, and parallelism — so the same corpus can be synthesized inside
Spark (``spark.range(n).mapInPandas``), in pandas for golden fixtures,
and in DuckDB-free tests, always byte-identical.

Host names follow a Zipf-ish distribution (a few hot hosts) to exercise
skew salting (SURVEY.md §7.4 hard-part 3).
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterable

import pandas as pd

from exstruct_spark.kernels.dom import strip_tags_text

ARCHETYPES = [
    "basic_table",
    "heuristic_table",
    "merged_form",
    "flowchart_svg",
    "chart_embed",
    "nested_list",
    "gantt",
    "boilerplate_heavy",
    "malformed",
    "hyperlink_rich",
]

_HOSTS = (
    ["hot.example.com"] * 8
    + ["warm.example.net"] * 4
    + ["mid.example.org"] * 2
    + ["a.example.io", "b.example.dev", "c.example.co", "d.example.jp"]
)

_WORDS_EN = (
    "analysis report quarterly revenue growth market segment structured "
    "extraction pipeline document table chart series region north south "
    "forecast margin inventory shipment supplier customer order detail"
).split()
_WORDS_JA = "売上 利益 四半期 成長 市場 部門 抽出 文書 表 図 系列 地域 予測 在庫 出荷 注文".split()

_EPOCH = _dt.datetime(2024, 3, 1, 0, 0, 0)


def _rng(seed: int, doc_id: int) -> random.Random:
    return random.Random((seed * 1_000_003 + doc_id * 7_919) & 0x7FFFFFFF)


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    words = _WORDS_JA if lang == "ja" else _WORDS_EN
    return " ".join(rng.choice(words) for _ in range(n))


def _paragraphs(rng: random.Random, lang: str, k: int) -> str:
    return "\n".join(
        f"<p>{_sentence(rng, lang, rng.randint(12, 28))}.</p>" for _ in range(k)
    )


def _nav_footer(rng: random.Random) -> tuple:
    nav = (
        "<nav><ul>"
        + "".join(f'<li><a href="/s/{i}">link {i}</a></li>' for i in range(8))
        + "</ul></nav>"
    )
    footer = (
        "<footer><p>"
        + " ".join(f'<a href="/f/{i}">footer{i}</a>' for i in range(6))
        + "</p></footer>"
    )
    return nav, footer


def _basic_table(rng: random.Random, lang: str) -> str:
    rows = []
    for m in range(rng.randint(3, 6)):
        qty = rng.randint(1, 500)
        price = f"{rng.randint(1, 999)}.{rng.randint(0, 99):02d}"
        rows.append(
            f"<tr><td>2024-0{m + 1}-01 00:00:00</td><td>{qty}</td><td>{price}</td></tr>"
        )
    return (
        "<table><thead><tr><th>month</th><th>qty</th><th>price</th></tr></thead>"
        "<tbody>" + "".join(rows) + "</tbody></table>"
    )


def _heuristic_table(rng: random.Random, lang: str) -> str:
    cells = lambda r: "".join(
        f"<div><span>{_sentence(rng, lang, 1)} {rng.randint(0, 99)}</span></div>"
        for _ in range(4)
    )
    rows = "".join(f"<div class='row'>{cells(r)}</div>" for r in range(4))
    return f"<div class='grid'>{rows}</div>"


def _merged_form(rng: random.Random, lang: str) -> str:
    label = _sentence(rng, lang, 2)
    return (
        "<table>"
        f"<tr><td rowspan='2'>{label}</td><td>alpha</td><td colspan='2'>beta {rng.randint(1, 9)}</td></tr>"
        f"<tr><td>gamma</td><td>{rng.randint(10, 99)}</td><td>delta</td></tr>"
        f"<tr><td colspan='4'>{_sentence(rng, lang, 3)}</td></tr>"
        "</table>"
    )


def _flowchart_svg(rng: random.Random, lang: str) -> str:
    y2 = 150 + rng.randint(0, 40)
    return (
        "<svg width='400' height='300'>"
        "<rect x='20' y='20' width='100' height='40'/>"
        "<text x='60' y='40'>Start</text>"
        f"<rect x='20' y='{y2}' width='100' height='40'/>"
        f"<text x='60' y='{y2 + 20}'>End</text>"
        "<ellipse cx='260' cy='40' rx='50' ry='25'/>"
        "<text x='250' y='45'>Check</text>"
        f"<line x1='70' y1='60' x2='70' y2='{y2}' marker-end='url(#arw)'/>"
        "<line x1='120' y1='40' x2='210' y2='40' marker-end='url(#arw)'/>"
        "</svg>"
    )


def _chart_embed(rng: random.Random, lang: str) -> str:
    pts = " ".join(
        f"{10 + 30 * i},{100 - rng.randint(5, 90)}" for i in range(6)
    )
    return (
        "<figure><svg width='200' height='100'>"
        f"<polyline points='{pts}'/>"
        "</svg>"
        f"<figcaption>{_sentence(rng, lang, 3)}</figcaption>"
        "<table><tr><th>x</th><th>y</th>"
        + "".join(
            f"<tr><td>{i}</td><td>{rng.randint(0, 100)}</td></tr>" for i in range(4)
        )
        + "</table></figure>"
    )


def _nested_list(rng: random.Random, lang: str) -> str:
    def ul(depth: int) -> str:
        items = []
        for _ in range(rng.randint(2, 3)):
            sub = ul(depth + 1) if depth < 3 and rng.random() < 0.7 else ""
            items.append(f"<li>{_sentence(rng, lang, 2)}{sub}</li>")
        return "<ul>" + "".join(items) + "</ul>"

    return ul(1)


def _gantt(rng: random.Random, lang: str) -> str:
    n_cols = rng.randint(12, 18)
    head = "".join(f"<th>w{i}</th>" for i in range(n_cols))
    rows = []
    for t in range(4):
        tds = "".join(
            f"<td>{'x' if rng.random() < 0.3 else ''}</td>" for _ in range(n_cols)
        )
        rows.append(f"<tr><td>task {t}</td>{tds}</tr>")
    return f"<table><tr><th>task</th>{head}</tr>{''.join(rows)}</table>"


def _boilerplate_heavy(rng: random.Random, lang: str) -> str:
    ads = "".join(
        f"<div class='ad'><a href='/ad/{i}'>{_sentence(rng, lang, 2)}</a></div>"
        for i in range(10)
    )
    return f"{ads}<article><h2>{_sentence(rng, lang, 3)}</h2>{_paragraphs(rng, lang, 3)}</article>{ads}"


def _malformed(rng: random.Random, lang: str) -> str:
    variant = rng.randint(0, 2)
    if variant == 0:
        return ""  # 0-byte document
    if variant == 1:
        return f"<html><body><p>{_sentence(rng, lang, 8)}<div><span>truncated"
    return f"<p>{_sentence(rng, lang, 6)}</p><table><tr><td>orphan"


def _hyperlink_rich(rng: random.Random, lang: str) -> str:
    rows = "".join(
        f"<tr><td><a href='https://ref.example/{i}'>{_sentence(rng, lang, 2)}</a></td>"
        f"<td>{rng.randint(1, 99)}</td></tr>"
        for i in range(4)
    )
    return f"<table><tr><th>name</th><th>score</th></tr>{rows}</table>"


_BUILDERS = {
    "basic_table": _basic_table,
    "heuristic_table": _heuristic_table,
    "merged_form": _merged_form,
    "flowchart_svg": _flowchart_svg,
    "chart_embed": _chart_embed,
    "nested_list": _nested_list,
    "gantt": _gantt,
    "boilerplate_heavy": _boilerplate_heavy,
    "malformed": _malformed,
    "hyperlink_rich": _hyperlink_rich,
}


def build_page(doc_id: int, seed: int = 42) -> dict:
    """One deterministic page row: url, warc_ts, html, text, lang,
    archetype."""
    rng = _rng(seed, doc_id)
    archetype = ARCHETYPES[doc_id % len(ARCHETYPES)]
    lang = "ja" if rng.random() < 0.3 else "en"
    host = rng.choice(_HOSTS)
    url = f"https://{host}/{archetype}/{doc_id}"
    body_core = _BUILDERS[archetype](rng, lang)
    if archetype == "malformed" and body_core == "":
        html = ""
    else:
        nav, footer = _nav_footer(rng)
        title = _sentence(rng, lang, 4)
        intro = _paragraphs(rng, lang, rng.randint(1, 3))
        html = (
            "<!DOCTYPE html><html><head>"
            f"<meta charset='utf-8'><title>{title}</title></head>"
            f"<body>{nav}<main><h1>{title}</h1>{intro}{body_core}</main>{footer}</body></html>"
        )
    raw = html.encode("utf-8")
    ts = _EPOCH + _dt.timedelta(seconds=(doc_id * 137) % 7_776_000)
    return {
        "url": url,
        "warc_ts": ts,
        "html": raw,
        "text": strip_tags_text(html),
        "lang": lang,
        "archetype": archetype,
    }


# --- rich-feature corpus (round 2) -----------------------------------------
# A SEPARATE archetype family exercising the round-2 extraction features
# (colors_map, id-wired connectors, rotated shapes, unit geometry, grid
# splitting, multi-series grid-bound charts).  Kept out of ARCHETYPES so
# the bench corpus — the cross-round regression workload — stays
# byte-identical.

def _colored_table(rng: random.Random, lang: str) -> str:
    palette = ["#ff0000", "#00ff00", "rgb(0,0,255)", "gold", "#ABC"]
    rows = []
    for r in range(3):
        tds = "".join(
            f"<td style='background:{rng.choice(palette)}'>{rng.randint(1, 99)}</td>"
            if rng.random() < 0.6
            else f"<td bgcolor='{rng.choice(palette)}'>{rng.randint(1, 99)}</td>"
            for _ in range(3)
        )
        rows.append(f"<tr>{tds}</tr>")
    return "<table><tr><th>a</th><th>b</th><th>c</th></tr>" + "".join(rows) + "</table>"


def _wired_flowchart(rng: random.Random, lang: str) -> str:
    y2 = 150 + rng.randint(0, 40)
    return (
        "<svg>"
        "<rect id='n1' x='20' y='20' width='100' height='40'/>"
        f"<rect id='n2' x='20' y='{y2}' width='100' height='40'"
        f" transform='rotate({rng.choice([15, 30, 90])} 70 {y2 + 20})'/>"
        "<text x='60' y='40'>Start</text>"
        f"<line x1='70' y1='60' x2='70' y2='{y2}' marker-end='url(#a)'"
        " data-begin='#n1' data-end='#n2'/>"
        f"<line x1='75' y1='60' x2='75' y2='{y2}' marker-end='url(#a)'/>"
        "</svg>"
    )


def _split_grid(rng: random.Random, lang: str) -> str:
    def block(tag):
        return "".join(
            "<div>" + "".join(
                f"<div>{tag}{r}{c} {rng.randint(0, 9)}</div>" for c in range(3)
            ) + "</div>"
            for r in range(3)
        )
    band = "<div><div></div><div></div><div></div></div>" * 2
    return f"<div class='grid'>{block('a')}{band}{block('b')}</div>"


def _unit_chart(rng: random.Random, lang: str) -> str:
    pts = " ".join(f"{i * 10},{rng.randint(5, 90)}" for i in range(4))
    pts2 = " ".join(f"{i * 10},{rng.randint(5, 90)}" for i in range(4))
    table_rows = "".join(
        f"<tr><td>{i}</td><td>{rng.randint(0, 50)}</td><td>{rng.randint(50, 99)}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><svg>"
        "<text class='y-axis-title' x='1' y='1'>Value</text>"
        f"<rect x='0' y='0' width='9pt' height='0.5in'/>"
        f"<polyline points='{pts}'/><polyline points='{pts2}'/>"
        "</svg><figcaption>Series pair</figcaption>"
        "<table><tr><th>x</th><th>s1</th><th>s2</th></tr>"
        + table_rows + "</table></figure>"
    )


def _script_chart(rng: random.Random, lang: str) -> str:
    """Inline Chart.js config (the web's dominant chart-data carrier) with
    a companion table — exercises the F7 nested-quote/brace tokenizer:
    quoted braces in the title, a callback returning '}', single AND
    double quotes, trailing commas."""
    a = [rng.randint(1, 99) for _ in range(4)]
    b = [rng.randint(1, 99) for _ in range(4)]
    rows = "".join(
        f"<tr><td>Q{i + 1}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><figcaption>Quarterly revenue</figcaption>"
        "<canvas id='c1'></canvas>"
        "<script>const ctx = document.getElementById('c1');\n"
        "new Chart(ctx, {type: 'line', data: {"
        "labels: ['Q1','Q2','Q3','Q4'], datasets: ["
        f"{{label: 'north', data: {a}, borderColor: '#36a2eb'}},"
        f'{{label: "south", data: {b}}},'
        "]}, options: {plugins: {title: {display: true,"
        " text: 'Revenue (\"net\")'}},"
        " scales: {y: {ticks: {callback: function(v) { return v + '}'; }}}},"
        "}});"
        "</script>"
        "<table><tr><th>q</th><th>north</th><th>south</th></tr>"
        + rows + "</table></figure>"
    )


def _highcharts_chart(rng: random.Random, lang: str) -> str:
    """Inline Highcharts config (the third chart dialect, VERDICT r4 #7):
    `Highcharts.chart(id, cfg)` with the dialect's distinguishing marks —
    `chart.type` (where 'bar' means HORIZONTAL), `xAxis.categories`, a
    trailing render callback — plus the companion table the grid binder
    joins against."""
    a = [rng.randint(1, 99) for _ in range(4)]
    b = [rng.randint(1, 99) for _ in range(4)]
    cats = ["Jan", "Feb", "Mar", "Apr"]
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><figcaption>Monthly output</figcaption>"
        "<div id='hc1'></div>"
        "<script>Highcharts.chart('hc1', {"
        "chart: {type: 'bar'},"
        "title: {text: 'Monthly output'},"
        f"xAxis: {{categories: {cats}}},"
        f"series: [{{name: 'east', data: {a}}},"
        f'{{name: "west", data: {b}}}],'
        "}, function(chart) { console.log('rendered}'); });"
        "</script>"
        "<table><tr><th>m</th><th>east</th><th>west</th></tr>"
        + rows + "</table></figure>"
    )


def _apex_chart(rng: random.Random, lang: str) -> str:
    """ApexCharts config (round 7 continuation, seventh JS dialect):
    ``new ApexCharts(el, options).render()`` with the dialect's marks —
    lowercase ``xaxis.categories``/``yaxis.title.text``, ``chart.type``
    where 'bar' is VERTICAL unless ``plotOptions.bar.horizontal`` —
    plus the companion table the grid binder joins against."""
    a = [rng.randint(1, 99) for _ in range(4)]
    cats = ["Q1", "Q2", "Q3", "Q4"]
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td></tr>" for i in range(4)
    )
    return (
        "<figure><figcaption>Quarterly units</figcaption>"
        "<div id='ax1'></div>"
        "<script>var options = {"
        "chart: {type: 'bar'},"
        "plotOptions: {bar: {horizontal: false}},"
        "title: {text: 'Quarterly units'},"
        f"series: [{{name: 'units', data: {a}}}],"
        f"xaxis: {{categories: {cats}}},"
        "yaxis: {title: {text: 'units'}}"
        "};"
        "var chart = new ApexCharts(document.querySelector('#ax1'),"
        " options); chart.render();"
        "</script>"
        "<table><tr><th>q</th><th>units</th></tr>"
        + rows + "</table></figure>"
    )


def _amcharts_chart(rng: random.Random, lang: str) -> str:
    """amCharts v3 classic config (eighth JS dialect): ``AmCharts.
    makeChart(div, cfg)`` with the dialect's marks — a dataProvider
    row list, categoryField labels, graphs[].valueField series — plus
    the companion table the grid binder joins against."""
    cats = ["USA", "China", "Japan", "Germany"]
    a = [rng.randint(100, 999) for _ in range(4)]
    rows_json = ",".join(
        f'{{"country": "{cats[i]}", "visits": {a[i]}}}' for i in range(4)
    )
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td></tr>" for i in range(4)
    )
    return (
        "<figure><figcaption>Country visits</figcaption>"
        "<div id='am1'></div>"
        "<script>var chart = AmCharts.makeChart('am1', {"
        '"type": "serial", "categoryField": "country",'
        '"titles": [{"text": "Country visits"}],'
        '"valueAxes": [{"title": "visits"}],'
        f'"dataProvider": [{rows_json}],'
        '"graphs": [{"valueField": "visits", "title": "visits",'
        ' "type": "column"}]'
        "});</script>"
        "<table><tr><th>country</th><th>visits</th></tr>"
        + rows + "</table></figure>"
    )


def _c3_chart(rng: random.Random, lang: str) -> str:
    """C3.js / billboard.js config (ninth JS dialect): ``c3.generate``
    with the dialect's marks — COLUMN-oriented ``data.columns`` whose
    first element names the series, a ``data.x`` label column,
    ``axis.y.label`` — plus the companion table the grid binder joins
    against."""
    a = [rng.randint(1, 99) for _ in range(3)]
    b = [rng.randint(1, 99) for _ in range(3)]
    cats = ["Jan", "Feb", "Mar"]
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(3)
    )
    return (
        "<figure><figcaption>Monthly throughput</figcaption>"
        "<div id='c3c'></div>"
        "<script>var chart = c3.generate({"
        "bindto: '#c3c',"
        f"data: {{ x: 'month', columns: ["
        f"['month', 'Jan', 'Feb', 'Mar'],"
        f"['reads', {a[0]}, {a[1]}, {a[2]}],"
        f"['writes', {b[0]}, {b[1]}, {b[2]}]"
        "], type: 'bar' },"
        "title: { text: 'Monthly throughput' },"
        "axis: { y: { label: { text: 'ops' } } }"
        "});</script>"
        "<table><tr><th>month</th><th>reads</th><th>writes</th></tr>"
        + rows + "</table></figure>"
    )


def _fusioncharts_chart(rng: random.Random, lang: str) -> str:
    """FusionCharts config (tenth JS dialect): ``new FusionCharts({
    type, dataSource})`` with the dialect's marks — STRING values,
    caption/yAxisName in dataSource.chart, the single-series
    [{label, value}] data form — plus the companion table."""
    cats = ["North", "South", "East", "West"]
    a = [rng.randint(10, 500) for _ in range(4)]
    data_json = ",".join(
        f'{{"label": "{cats[i]}", "value": "{a[i]}"}}' for i in range(4)
    )
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td></tr>" for i in range(4)
    )
    return (
        "<figure><figcaption>Regional sales</figcaption>"
        "<div id='fc1'></div>"
        "<script>FusionCharts.ready(function(){"
        "var fc = new FusionCharts({"
        "type: 'column2d', renderAt: 'fc1', width: '500',"
        "dataSource: { chart: { caption: 'Regional sales',"
        " yAxisName: 'units', theme: 'fusion' },"
        f"data: [{data_json}] }}"
        "}); fc.render(); });</script>"
        "<table><tr><th>region</th><th>units</th></tr>"
        + rows + "</table></figure>"
    )


def _rss_feed(rng: random.Random, lang: str) -> str:
    """A WHOLE RSS 2.0 document (raw-doc archetype: no HTML wrapper —
    the first real tag must be <rss> for the G6 feed route).  Items
    carry links, dates, escaped-HTML descriptions and one podcast
    enclosure."""
    n = rng.randint(3, 6)
    items = []
    for i in range(n):
        t = _sentence(rng, lang, 4)
        items.append(
            f"<item><title>{t}</title>"
            f"<link>https://rich.example/post/{i}</link>"
            f"<pubDate>Mon, 0{(i % 9) + 1} Jun 2021 08:00:00 GMT"
            f"</pubDate>"
            f"<description>&lt;p&gt;{_sentence(rng, lang, 8)}"
            f"&lt;/p&gt;</description>"
            + ("<enclosure url='https://rich.example/ep.mp3'"
               " type='audio/mpeg' length='1'/>" if i == 0 else "")
            + "</item>")
    return ("<?xml version='1.0' encoding='UTF-8'?>\n"
            "<rss version='2.0'><channel>"
            f"<title>{_sentence(rng, lang, 3)}</title>"
            "<link>https://rich.example/</link>"
            + "".join(items) + "</channel></rss>")


def _atom_feed(rng: random.Random, lang: str) -> str:
    """A WHOLE Atom document (raw-doc archetype): entries with
    rel=alternate links, published dates, categories, authors."""
    n = rng.randint(2, 5)
    entries = []
    for i in range(n):
        entries.append(
            f"<entry><title>{_sentence(rng, lang, 4)}</title>"
            f"<link rel='self' href='https://rich.example/e/{i}.atom'/>"
            f"<link rel='alternate' href='https://rich.example/e/{i}'/>"
            f"<published>2021-0{(i % 9) + 1}-01T08:00:00Z</published>"
            f"<category term='t{i % 3}'/>"
            f"<author><name>Author {i % 2}</name></author>"
            f"<summary>{_sentence(rng, lang, 7)}</summary></entry>")
    return ("<?xml version='1.0' encoding='utf-8'?>\n"
            "<feed xmlns='http://www.w3.org/2005/Atom' xml:lang='en'>"
            f"<title>{_sentence(rng, lang, 3)}</title>"
            + "".join(entries) + "</feed>")


def _sitemap_doc(rng: random.Random, lang: str) -> str:
    """A WHOLE urlset sitemap (raw-doc archetype): loc + lastmod +
    changefreq entries."""
    n = rng.randint(4, 9)
    urls = "".join(
        f"<url><loc>https://rich.example/page/{i}</loc>"
        f"<lastmod>2024-0{(i % 9) + 1}-15</lastmod>"
        f"<changefreq>{'daily' if i % 2 else 'weekly'}</changefreq>"
        f"</url>" for i in range(n))
    return ("<?xml version='1.0' encoding='UTF-8'?>\n"
            "<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/"
            "0.9'>" + urls + "</urlset>")


# archetypes that ARE whole documents (no HTML wrapper)
RAW_DOC_ARCHETYPES = frozenset({"rss_feed", "atom_feed", "sitemap_doc"})


def _chartist_chart(rng: random.Random, lang: str) -> str:
    """Chartist config (thirteenth JS dialect): the chart type lives in
    the CONSTRUCTOR name; series are bare value arrays."""
    a = [rng.randint(1, 60) for _ in range(4)]
    b = [rng.randint(1, 60) for _ in range(4)]
    weeks = ["W1", "W2", "W3", "W4"]
    rows = "".join(
        f"<tr><td>{weeks[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><figcaption>Weekly visits</figcaption>"
        "<div class='ct-chart'></div>"
        "<script>new Chartist.Bar('.ct-chart', {"
        f"labels: {weeks}, series: [{a}, {b}]"
        "}, { seriesBarDistance: 10 });</script>"
        "<table><tr><th>week</th><th>a</th><th>b</th></tr>"
        + rows + "</table></figure>"
    )


def _frappe_chart(rng: random.Random, lang: str) -> str:
    """Frappe Charts config (fourteenth JS dialect): data.labels +
    datasets[].values (the `values` key is the dialect mark)."""
    a = [rng.randint(5, 95) for _ in range(3)]
    cats = ["Mon", "Tue", "Wed"]
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td></tr>" for i in range(3)
    )
    return (
        "<figure><figcaption>Daily signups</figcaption>"
        "<div id='fp1'></div>"
        "<script>new frappe.Chart('#fp1', {"
        "title: 'Daily signups',"
        f"data: {{ labels: {cats},"
        f" datasets: [{{ name: 'signups', values: {a} }}] }},"
        "type: 'bar', height: 250});</script>"
        "<table><tr><th>day</th><th>signups</th></tr>"
        + rows + "</table></figure>"
    )


def _dygraph_chart(rng: random.Random, lang: str) -> str:
    """Dygraphs config (eleventh JS dialect): ``new Dygraph(el, csv,
    opts)`` with the dialect's mark — the data is a CSV STRING built
    from '+'-joined literals — plus the companion table."""
    a = [rng.randint(50, 90) for _ in range(3)]
    b = [rng.randint(10, 40) for _ in range(3)]
    dates = ["2020-01-01", "2020-01-02", "2020-01-03"]
    rows = "".join(
        f"<tr><td>{dates[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(3)
    )
    csv_lines = "".join(
        f"    '{dates[i]},{a[i]},{b[i]}\\n' +\n" for i in range(3)
    ).rstrip("+\n ")
    return (
        "<figure><figcaption>Station readings</figcaption>"
        "<div id='dg1'></div>"
        "<script>g = new Dygraph(document.getElementById('dg1'),\n"
        "    'Date,High,Low\\n' +\n"
        f"{csv_lines},\n"
        "    { title: 'Station readings', ylabel: 'deg F' });"
        "</script>"
        "<table><tr><th>date</th><th>high</th><th>low</th></tr>"
        + rows + "</table></figure>"
    )


def _bordered_grid(rng: random.Random, lang: str) -> str:
    """Bordered div layout with NON-uniform rows (widths 3/5/3/1): only
    the CSS-border signal (G1) detects it — the structural child-
    uniformity gate rejects the raggedness."""
    cell = "style='border:1px solid #999'"
    widths = [3, 5, 3, 1]
    rows = []
    for r, w in enumerate(widths):
        cells = "".join(
            f"<div {cell}>{rng.randint(1, 99)}</div>" if r or c == 0
            else f"<div {cell}>h{c}</div>"
            for c in range(w)
        )
        rows.append(f"<div>{cells}</div>")
    return "<div class='bordered-layout'>" + "".join(rows) + "</div>"


def _styled_grid(rng: random.Random, lang: str) -> str:
    """CLASS-styled twin of ``_bordered_grid`` (VERDICT r5 #1): the same
    non-uniform geometry (widths 3/5/3/1, structural gate rejects), but
    the border arrives via a same-document ``<style>`` class rule and
    the first cell carries a class-declared fill — only the CSS
    class-rule resolver (kernels/css.py) sees either signal, which is
    how most real crawled tables are styled."""
    widths = [3, 5, 3, 1]
    rows = []
    for r, w in enumerate(widths):
        cells = "".join(
            f"<div class='gc'>{rng.randint(1, 99)}</div>" if r or c == 0
            else f"<div class='gc'>h{c}</div>"
            for c in range(w)
        )
        rows.append(f"<div>{cells}</div>")
    return (
        "<style>.gc { border: 1px solid #999 } "
        ".styled-layout div.gc:first-child { color: red } "
        ".hl { background-color: #FFEE00 }</style>"
        "<div class='styled-layout'>" + "".join(rows) + "</div>"
        "<table><tr><th class='hl'>k</th><th>v</th></tr>"
        f"<tr><td>rows</td><td>{sum(widths)}</td></tr></table>"
    )


def _styled_grid_descendant(rng: random.Random, lang: str) -> str:
    """Combinator-styled twin (VERDICT r6 Missing #1 done-criterion):
    the border and fill signals are reachable ONLY through descendant/
    child combinator rules — the cells themselves carry no class — which
    is how most real crawled tables are styled (``table.pricing td``
    style rules, cells rarely classed)."""
    widths = [3, 5, 3, 1]
    rows = []
    for r, w in enumerate(widths):
        cells = "".join(
            f"<div>{rng.randint(1, 99)}</div>" if r or c == 0
            else f"<div>h{c}</div>"
            for c in range(w)
        )
        rows.append(f"<div>{cells}</div>")
    return (
        "<style>div.pricing > div > div { border: 1px solid #888 } "
        "#prices th { background-color: #00CCFF }</style>"
        "<div class='pricing'>" + "".join(rows) + "</div>"
        "<table id='prices'><tr><th>k</th><th>v</th></tr>"
        f"<tr><td>rows</td><td>{sum(widths)}</td></tr></table>"
    )


def _striped_table(rng: random.Random, lang: str) -> str:
    """Zebra-striped table (round 7): the row backgrounds exist ONLY
    through a ``tr:nth-child(even)`` rule and the first column's border
    only through ``td:first-child`` — the standard way real tables are
    striped (no per-row classes, no inline styles).  Exercises the
    structural-pseudo-class path of kernels/css.py end-to-end."""
    n_rows = 4 + rng.randint(0, 2)
    rows = "".join(
        f"<tr><td>r{r}</td><td>{rng.randint(1, 99)}</td>"
        f"<td>{rng.randint(1, 99)}</td></tr>"
        for r in range(n_rows)
    )
    return (
        "<style>#zt tr:nth-child(even) { background-color: #DDEEFF } "
        "#zt td:first-child { border-left: 2px solid #333 }</style>"
        f"<table id='zt'><tr><th>k</th><th>a</th><th>b</th></tr>{rows}"
        "</table>"
    )


def _divider_table(rng: random.Random, lang: str) -> str:
    """Sibling-combinator / attribute-selector table (round 7): the row
    dividers exist ONLY through ``tr + tr { border-top }`` — THE
    canonical real-web row-divider idiom — and the numeric column's
    fill only through ``td[align=right]``; a ``:not(.total)`` rule
    proves negation does not over-match.  No per-row classes, no
    inline styles."""
    n_rows = 4 + rng.randint(0, 2)
    rows = "".join(
        f"<tr><td>item {r}</td>"
        f"<td align='right'>{rng.randint(1, 999)}</td></tr>"
        for r in range(n_rows)
    )
    return (
        "<style>#dv tr + tr { border-top: 1px solid #666 } "
        "#dv td[align=right] { background-color: #F5F5DC } "
        "#dv tr:not(.total) td { border-bottom: 1px dotted #CCC }"
        "</style>"
        f"<table id='dv'><tr><th>item</th><th>amount</th></tr>{rows}"
        f"<tr class='total'><td>total</td>"
        f"<td align='right'>{rng.randint(100, 9999)}</td></tr></table>"
    )


def _structured_article(rng: random.Random, lang: str) -> str:
    """schema.org structured data (round 6): a JSON-LD Article with a
    nested author entity plus a microdata Product — the author-declared
    metadata layer a crawl extractor harvests alongside the heuristic
    families."""
    price = f"{rng.randint(1, 99)}.{rng.randint(0, 99):02d}"
    title = _sentence(rng, lang, 4)
    return (
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@type": "Article",'
        f'"headline": "{title}",'
        '"datePublished": "2024-03-01",'
        '"author": {"@type": "Person", "name": "A. Writer"}}'
        "</script>"
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Widget</span>'
        f'<meta itemprop="price" content="{price}">'
        "</div>"
        f"<p>{_sentence(rng, lang, 12)}.</p>"
    )


def _gviz_chart(rng: random.Random, lang: str) -> str:
    """Google Charts (the SIXTH dialect): arrayToDataTable row-major
    data with a header row, constructor-typed, options title, plus the
    companion table the grid binder joins."""
    cats = ["Q1", "Q2", "Q3", "Q4"]
    a = [rng.randint(1, 99) for _ in range(4)]
    b = [rng.randint(1, 99) for _ in range(4)]
    data_rows = ", ".join(
        f"['{cats[i]}', {a[i]}, {b[i]}]" for i in range(4))
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><figcaption>Regional totals</figcaption>"
        "<div id='gc1'></div>"
        "<script>google.charts.load('current', "
        "{packages:['corechart']});"
        "google.charts.setOnLoadCallback(function() {"
        "var data = google.visualization.arrayToDataTable(["
        f"['q', 'north', 'south'], {data_rows}]);"
        "var chart = new google.visualization.ColumnChart("
        "document.getElementById('gc1'));"
        "chart.draw(data, {title: 'Regional totals'});});"
        "</script>"
        "<table><tr><th>q</th><th>north</th><th>south</th></tr>"
        + rows + "</table></figure>"
    )


def _vegalite_chart(rng: random.Random, lang: str) -> str:
    """Inline Vega-Lite spec (the FIFTH chart dialect — pure JSON, no JS
    tokenization): long-format data.values split into series by the
    color field, plus the companion table the grid binder joins."""
    cats = ["Q1", "Q2", "Q3", "Q4"]
    a = [rng.randint(1, 99) for _ in range(4)]
    b = [rng.randint(1, 99) for _ in range(4)]
    values = ", ".join(
        f'{{"q": "{cats[i]}", "units": {v}, "region": "{name}"}}'
        for name, vals in (("north", a), ("south", b))
        for i, v in enumerate(vals)
    )
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><figcaption>Unit shipments</figcaption>"
        "<div id='vl1'></div>"
        "<script>vegaEmbed('#vl1', {"
        '"$schema": "https://vega.github.io/schema/vega-lite/v5.json",'
        '"title": "Unit shipments", "mark": "bar",'
        f'"data": {{"values": [{values}]}},'
        '"encoding": {"x": {"field": "q", "type": "nominal"},'
        '"y": {"field": "units", "type": "quantitative"},'
        '"color": {"field": "region", "type": "nominal"}}'
        "});</script>"
        "<table><tr><th>q</th><th>north</th><th>south</th></tr>"
        + rows + "</table></figure>"
    )


def _responsive_gallery(rng: random.Random, lang: str) -> str:
    """Responsive/lazy image markup (VERDICT r5 #3): srcset width
    descriptors, a <picture> with <source srcset>, and a lazy-loaded
    spacer whose real URL is in data-src — the LAION-style pair harvest
    must pick one deterministic best URL from each."""
    n = rng.randint(100, 999)
    return (
        "<figure><figcaption>Skyline at dusk</figcaption>"
        f"<img src='/img/sky-{n}-400.jpg' alt='skyline'"
        f" srcset='/img/sky-{n}-400.jpg 400w, /img/sky-{n}-1600.jpg 1600w,"
        f" /img/sky-{n}-800.jpg 800w'></figure>"
        "<picture>"
        f"<source srcset='/img/river-{n}.webp' type='image/webp'>"
        f"<source srcset='/img/river-{n}.jpg' type='image/jpeg'>"
        f"<img src='/img/river-{n}-fallback.jpg' alt='river bend'>"
        "</picture>"
        "<img src='data:image/gif;base64,R0lGODlhAQABAAAAACw=' "
        f"data-src='/img/lazy-{n}.png' alt='lazy boat' width='640' "
        "height='480'>"
    )


def _aria_grid(rng: random.Random, lang: str) -> str:
    """ARIA-declared table (role=table/row/cell + columnheader,
    aria-label, one aria-colspan merge) — the G7 declared-table twin's
    corpus carrier: no <table> markup, no CSS borders, structure comes
    ONLY from the ARIA declaration."""
    rows = []
    rows.append(
        "<div role='row'>"
        + "".join(f"<span role='columnheader'>h{c}</span>" for c in range(3))
        + "</div>"
    )
    for r in range(3):
        cells = "".join(
            f"<span role='cell'>{rng.randint(1, 99)}</span>" for _ in range(3)
        )
        rows.append(f"<div role='row'>{cells}</div>")
    rows.append(
        "<div role='row'><span role='cell' aria-colspan='3'>total "
        f"{rng.randint(100, 999)}</span></div>"
    )
    return (
        "<div role='table' aria-label='metrics grid'>"
        + "".join(rows) + "</div>"
    )


def _plotly_chart(rng: random.Random, lang: str) -> str:
    """Inline Plotly config (the FOURTH chart dialect): the data is an
    ARRAY of trace objects — not a single config dict — with the
    title in a separate layout argument, plus the companion table the
    grid binder joins against."""
    a = [rng.randint(1, 99) for _ in range(4)]
    b = [rng.randint(1, 99) for _ in range(4)]
    cats = ["Q1", "Q2", "Q3", "Q4"]
    rows = "".join(
        f"<tr><td>{cats[i]}</td><td>{a[i]}</td><td>{b[i]}</td></tr>"
        for i in range(4)
    )
    return (
        "<figure><figcaption>Quarterly revenue</figcaption>"
        "<div id='pl1'></div>"
        "<script>Plotly.newPlot('pl1', ["
        f"{{x: {cats}, y: {a}, type: 'bar', name: 'north'}},"
        f"{{x: {cats}, y: {b}, type: 'bar', name: 'south'}}"
        "], {title: {text: 'Quarterly revenue'}}, {responsive: true});"
        "</script>"
        "<table><tr><th>q</th><th>north</th><th>south</th></tr>"
        + rows + "</table></figure>"
    )


RICH_ARCHETYPES = [
    "colored_table", "wired_flowchart", "split_grid", "unit_chart",
    "script_chart", "bordered_grid", "highcharts_chart", "aria_grid",
    "plotly_chart", "styled_grid", "responsive_gallery", "vegalite_chart",
    "gviz_chart", "structured_article", "styled_grid_descendant", "striped_table",
    "divider_table", "apex_chart", "amcharts_chart", "c3_chart",
    "fusioncharts_chart", "dygraph_chart", "rss_feed",
    "chartist_chart", "frappe_chart", "atom_feed", "sitemap_doc",
]
_RICH_BUILDERS = {
    "colored_table": _colored_table,
    "wired_flowchart": _wired_flowchart,
    "split_grid": _split_grid,
    "unit_chart": _unit_chart,
    "script_chart": _script_chart,
    "bordered_grid": _bordered_grid,
    "highcharts_chart": _highcharts_chart,
    "aria_grid": _aria_grid,
    "plotly_chart": _plotly_chart,
    "styled_grid": _styled_grid,
    "responsive_gallery": _responsive_gallery,
    "vegalite_chart": _vegalite_chart,
    "gviz_chart": _gviz_chart,
    "structured_article": _structured_article,
    "styled_grid_descendant": _styled_grid_descendant,
    "striped_table": _striped_table,
    "divider_table": _divider_table,
    "apex_chart": _apex_chart,
    "amcharts_chart": _amcharts_chart,
    "c3_chart": _c3_chart,
    "fusioncharts_chart": _fusioncharts_chart,
    "dygraph_chart": _dygraph_chart,
    "rss_feed": _rss_feed,
    "chartist_chart": _chartist_chart,
    "frappe_chart": _frappe_chart,
    "atom_feed": _atom_feed,
    "sitemap_doc": _sitemap_doc,
}


def build_rich_page(doc_id: int, seed: int = 42) -> dict:
    rng = _rng(seed ^ 0x5A5A, doc_id)
    archetype = RICH_ARCHETYPES[doc_id % len(RICH_ARCHETYPES)]
    lang = "en"
    url = f"https://rich.example/{archetype}/{doc_id}"
    nav, footer = _nav_footer(rng)
    title = _sentence(rng, lang, 3)
    if archetype in RAW_DOC_ARCHETYPES:
        # whole-document archetypes (feeds): no HTML wrapper — the
        # first real tag routes the G6 dispatch
        html = _RICH_BUILDERS[archetype](rng, lang)
    else:
        html = (
            "<!DOCTYPE html><html><head>"
            f"<meta charset='utf-8'><title>{title}</title></head>"
            f"<body>{nav}<main><h1>{title}</h1>"
            f"{_paragraphs(rng, lang, 2)}{_RICH_BUILDERS[archetype](rng, lang)}"
            f"</main>{footer}</body></html>"
        )
    raw = html.encode("utf-8")
    ts = _EPOCH + _dt.timedelta(seconds=(doc_id * 211) % 7_776_000)
    return {
        "url": url,
        "warc_ts": ts,
        "html": raw,
        "text": strip_tags_text(html),
        "lang": lang,
        "archetype": archetype,
    }


def gen_rich_pages_pdf(doc_ids: Iterable[int], seed: int = 42) -> pd.DataFrame:
    rows = [build_rich_page(int(i), seed) for i in doc_ids]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "archetype"]
    )


def spark_rich_pages(spark, n: int, seed: int = 42, partitions: int = 8):
    def gen(batches):
        for pdf in batches:
            yield gen_rich_pages_pdf(pdf["id"].tolist(), seed)

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, schema=PAGES_SCHEMA_DDL
    )


def gen_pages_pdf(doc_ids: Iterable[int], seed: int = 42) -> pd.DataFrame:
    """pandas kernel: ids -> pages frame (usable inside mapInPandas)."""
    rows = [build_page(int(i), seed) for i in doc_ids]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "archetype"]
    )


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, archetype string"
)


def spark_pages(spark, n: int, seed: int = 42, partitions: int = 32):
    """Distributed deterministic corpus: ``spark.range`` -> ``mapInPandas``.

    The generator runs executor-side (no driver collect), deterministic per
    doc_id regardless of partitioning — the Iceberg-table stand-in mandated
    by BASELINE.json input_hint.
    """

    def gen(batches):
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].tolist(), seed)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
    )
