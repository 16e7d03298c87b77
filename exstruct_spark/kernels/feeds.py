"""RSS / Atom / sitemap extraction — the crawl's OTHER document types.

A Common-Crawl-style corpus is not only HTML: syndication feeds and
sitemaps ride the same (url, html) rows.  This is the G6
parser-per-kind dispatch (reference ``detect_tables`` dispatcher,
core/cells.py:1897-1943) widened with the two XML families a crawl
pipeline actually mines — feeds carry publication dates and summaries
(curation metadata), sitemaps carry the site's own URL inventory (a
frontier/coverage signal).

Parsing uses the repo's parser in ``xml_mode`` (self-closing honored
on any element, HTML void list off — ``<link>url</link>`` is a text
container in RSS and ``<category term=x/>`` must not swallow its
siblings).  ``_text_after_void`` remains as the belt for the stdlib
HTML-fallback parse path, where ``<link>`` is void and RSS link URLs
land as sibling text.

Caps (no-silent-caps: counts are visible in the record):
MAX_FEED_ITEMS items per feed, MAX_SITEMAP_URLS locs per sitemap.
"""

from __future__ import annotations

import re

from exstruct_spark.kernels.dom import Node, strip_tags_text

MAX_FEED_ITEMS = 128
MAX_SITEMAP_URLS = 512
MAX_TEXT = 2048

_FIRST_TAG_RE = re.compile(r"<([a-zA-Z][\w:.-]*)")
# an unterminated '<!--' in the sniff window is comment-to-end (ADVICE
# r7) — matching the tokenizer's own comment rule, so a comment whose
# '-->' falls beyond the window cannot leak a commented-out '<rss' into
# the first-tag probe and misroute a real HTML page
_HEAD_COMMENT_RE = re.compile(r"<!--.*?(?:-->|$)", re.S)


def sniff_feed_kind(text: str):
    """Decoded document text -> 'rss' | 'atom' | 'sitemap' |
    'sitemapindex' | None.  The FIRST real tag decides (xml decls and
    doctypes never match the tag regex; head comments are stripped so
    a commented-out ``<rss>`` above an HTML page cannot misroute);
    anything else first (``<html>``…) means not a feed."""
    m = _FIRST_TAG_RE.search(_HEAD_COMMENT_RE.sub("", text[:4096]))
    if m is None:
        return None
    name = m.group(1).lower()
    if name in ("rss", "rdf:rdf"):
        return "rss"
    if name == "feed":
        return "atom"
    if name == "urlset":
        return "sitemap"
    if name == "sitemapindex":
        return "sitemapindex"
    if name == "opml":
        return "opml"
    return None


MAX_ROBOTS_GROUPS = 32
MAX_ROBOTS_RULES = 64


def sniff_robots(text: str) -> bool:
    """robots.txt documents: plain text whose first non-comment,
    non-blank line is a robots directive.  The crawl-governance input
    — a pipeline that ignores it cannot claim polite recrawl."""
    for line in text[:4096].splitlines():
        s = line.strip()
        if not s or s.startswith("#"):
            continue
        key = s.split(":", 1)[0].strip().lower()
        return key in ("user-agent", "sitemap", "disallow", "allow",
                       "crawl-delay")
    return False


def extract_robots(text: str) -> dict:
    """robots.txt -> {groups: [{agents, disallow, allow,
    crawl_delay?}], sitemaps: [...]}.  Per REP: consecutive user-agent
    lines open one group; rules attach to the open group; Sitemap is
    group-independent.  Caps surfaced."""
    groups: list = []
    sitemaps: list = []
    cur = None
    last_was_agent = False
    truncated = 0
    for line in text.splitlines():
        s = line.split("#", 1)[0].strip()
        if not s or ":" not in s:
            last_was_agent = False
            continue
        key, _, val = s.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val and len(sitemaps) < MAX_ROBOTS_RULES:
                sitemaps.append(val[:MAX_TEXT])
            last_was_agent = False
            continue
        if key == "user-agent":
            if not val:
                continue
            if cur is None or not last_was_agent:
                if len(groups) >= MAX_ROBOTS_GROUPS:
                    truncated += 1
                    cur = None
                else:
                    cur = {"agents": [], "disallow": [], "allow": []}
                    groups.append(cur)
            if cur is not None and len(cur["agents"]) < 16:
                cur["agents"].append(val[:128])
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any user-agent line: ignored (REP)
        if key in ("disallow", "allow"):
            if len(cur[key]) < MAX_ROBOTS_RULES:
                cur[key].append(val[:MAX_TEXT])
            else:
                truncated += 1
        elif key == "crawl-delay" and "crawl_delay" not in cur:
            try:
                cur["crawl_delay"] = float(val)
            except ValueError:
                pass
    for g in groups:
        if not g["disallow"]:
            del g["disallow"]
        if not g["allow"]:
            del g["allow"]
    out: dict = {"content_type": "robots", "groups": groups}
    if sitemaps:
        out["sitemaps"] = sitemaps
    if truncated:
        out["rules_truncated"] = truncated
    return out


def sniff_json_feed(text: str) -> bool:
    """JSON Feed documents (jsonfeed.org): a top-level JSON object
    whose version URL names the spec.  Cheap head test — the JSON
    parse itself is the real gate in ``extract_json_feed``."""
    head = text[:4096].lstrip()
    return head.startswith("{") and "jsonfeed.org/version" in head


def extract_json_feed(text: str) -> dict:
    """JSON Feed text -> the same feed record shape as RSS/Atom.
    Raises on malformed JSON (the caller's fallback-not-fail wrapper
    records the reason)."""
    import json as _json

    doc = _json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("json feed root is not an object")
    items = []
    raw_items = doc.get("items")
    raw_items = raw_items if isinstance(raw_items, list) else []
    for it in raw_items[:MAX_FEED_ITEMS]:
        if not isinstance(it, dict):
            continue
        rec: dict = {}
        title = it.get("title")
        if isinstance(title, str) and title.strip():
            rec["title"] = _clean(title, 512)
        link = it.get("url") or it.get("external_url")
        if isinstance(link, str) and link.strip():
            rec["link"] = link.strip()[:MAX_TEXT]
        pub = it.get("date_published") or it.get("date_modified")
        if isinstance(pub, str) and pub.strip():
            rec["published"] = pub.strip()[:64]
        summary = (it.get("summary") or it.get("content_text")
                   or it.get("content_html"))
        if isinstance(summary, str) and summary.strip():
            rec["summary"] = _clean(summary)
        tags = it.get("tags")
        if isinstance(tags, list):
            cats = [str(t)[:64] for t in tags[:8]
                    if isinstance(t, str) and t.strip()]
            if cats:
                rec["categories"] = cats
        author = it.get("author") or {}
        if isinstance(author, dict):
            nm = author.get("name")
            if isinstance(nm, str) and nm.strip():
                rec["author"] = nm.strip()[:128]
        att = it.get("attachments")
        if isinstance(att, list):
            for a in att:
                if isinstance(a, dict) and isinstance(
                        a.get("url"), str) and a["url"].strip():
                    rec["enclosure"] = a["url"].strip()[:MAX_TEXT]
                    mt = a.get("mime_type")
                    if isinstance(mt, str) and mt.strip():
                        rec["enclosure_type"] = mt.strip()[:64]
                    break
        if rec:
            items.append(rec)
    out = {"content_type": "feed", "kind": "jsonfeed", "items": items}
    title = doc.get("title")
    if isinstance(title, str) and title.strip():
        out["title"] = _clean(title, 512)
    lang = doc.get("language")
    if isinstance(lang, str) and lang.strip():
        out["lang"] = lang.strip().lower()[:16]
    if len(raw_items) > len(items):
        out["items_truncated"] = len(raw_items) - len(items)
    return out


def _text_after_void(parent: Node, tag: str) -> str:
    """Text that FOLLOWED a void-parsed element until the next element
    — where RSS ``<link>url</link>`` content lands under tag soup."""
    take = False
    parts: list = []
    for ch in parent.children:
        if isinstance(ch, str):
            if take:
                parts.append(ch)
        else:
            if take:
                break
            if ch.tag == tag:
                take = True
    return "".join(parts).strip()


def _child_text(parent: Node, *tags: str) -> str:
    """First direct child with one of ``tags`` -> its text."""
    for ch in parent.element_children():
        if ch.tag in tags:
            return ch.text_content().strip()
    return ""


def _clean(s: str, cap: int = MAX_TEXT) -> str:
    """Feed descriptions often carry escaped HTML that the entity
    decode already unescaped once — strip any remaining markup."""
    if "<" in s:
        s = strip_tags_text(s)
    return re.sub(r"\s+", " ", s).strip()[:cap]


def extract_feed(root: Node, kind: str) -> dict:
    """Parsed feed/sitemap DOM -> extraction record fields."""
    if kind in ("sitemap", "sitemapindex"):
        # one record per <url>/<sitemap> entry: loc + the crawl-
        # scheduling fields (lastmod; changefreq/priority for urlsets)
        entries = root.find_all("url" if kind == "sitemap"
                                else "sitemap")
        locs = []
        for ent in entries:
            if len(locs) >= MAX_SITEMAP_URLS:
                break
            u = _child_text(ent, "loc")
            if not u:
                continue
            rec = {"loc": u[:MAX_TEXT]}
            lastmod = _child_text(ent, "lastmod")
            if lastmod:
                rec["lastmod"] = lastmod[:40]
            if kind == "sitemap":
                cf = _child_text(ent, "changefreq")
                if cf:
                    rec["changefreq"] = cf[:16]
            locs.append(rec)
        if not locs:
            # tolerate entry-less soup: bare <loc> tags
            locs = [{"loc": n.text_content().strip()[:MAX_TEXT]}
                    for n in root.find_all("loc")[:MAX_SITEMAP_URLS]
                    if n.text_content().strip()]
        out = {"content_type": "sitemap", "kind": kind, "urls": locs}
        total = len(entries) or len(root.find_all("loc"))
        if total > len(locs):
            out["urls_truncated"] = total - len(locs)
        return out

    if kind == "opml":
        # feed-INVENTORY documents (blogrolls, podcast subscription
        # exports): outline nodes carry xmlUrl (the feed) and htmlUrl
        # (the site) — a feed-discovery input for the crawl frontier
        outlines = []
        all_nodes = root.find_all("outline")
        title = ""
        head = root.find_first("head")
        if head is not None:
            title = _child_text(head, "title")
        for n in all_nodes:
            if len(outlines) >= MAX_FEED_ITEMS:
                break
            xml_url = (n.attrs.get("xmlurl") or "").strip()
            if not xml_url:
                continue  # grouping outlines carry no feed
            rec = {"xml_url": xml_url[:MAX_TEXT]}
            label = (n.attrs.get("title") or n.attrs.get("text")
                     or "").strip()
            if label:
                rec["title"] = _clean(label, 256)
            html_url = (n.attrs.get("htmlurl") or "").strip()
            if html_url:
                rec["html_url"] = html_url[:MAX_TEXT]
            outlines.append(rec)
        out = {"content_type": "opml", "kind": "opml",
               "outlines": outlines}
        if title:
            out["title"] = _clean(title, 256)
        n_feeds = sum(1 for n in all_nodes
                      if (n.attrs.get("xmlurl") or "").strip())
        if n_feeds > len(outlines):
            out["outlines_truncated"] = n_feeds - len(outlines)
        return out

    items: list = []
    lang = ""
    if kind == "rss":
        feed_title = ""
        channel = root.find_first("channel")
        if channel is not None:
            feed_title = _child_text(channel, "title")
            # <language>en-us</language> — the feed's own lang claim,
            # a multilingual-curation join key
            lang = _child_text(channel, "language",
                               "dc:language").lower()
        nodes = root.find_all("item")
        for it in nodes[:MAX_FEED_ITEMS]:
            rec: dict = {}
            title = _child_text(it, "title")
            if title:
                rec["title"] = _clean(title, 512)
            # xml_mode parses <link>url</link> as a real container; the
            # sibling-text fallback covers HTML-parsed trees (stdlib
            # fallback path) where link is a void element
            link = _child_text(it, "link") or _text_after_void(it, "link")
            if link:
                rec["link"] = link[:MAX_TEXT]
            pub = _child_text(it, "pubdate", "dc:date")
            if pub:
                rec["published"] = pub[:64]
            desc = _child_text(it, "description", "content:encoded")
            if desc:
                rec["summary"] = _clean(desc)
            cats = [c.text_content().strip()
                    for c in it.element_children()
                    if c.tag == "category"][:8]
            cats = [c[:64] for c in cats if c]
            if cats:
                rec["categories"] = cats
            author = _child_text(it, "author", "dc:creator")
            if author:
                rec["author"] = author[:128]
            for enc in it.element_children():
                if enc.tag == "enclosure":
                    u = (enc.attrs.get("url") or "").strip()
                    if u:
                        rec["enclosure"] = u[:MAX_TEXT]
                        t = (enc.attrs.get("type") or "").strip()
                        if t:
                            rec["enclosure_type"] = t[:64]
                    break
            if rec:
                items.append(rec)
    else:  # atom
        feed_node = root.find_first("feed") or root
        feed_title = _child_text(feed_node, "title")
        lang = (feed_node.attrs.get("xml:lang") or "").strip().lower()
        nodes = root.find_all("entry")
        for it in nodes[:MAX_FEED_ITEMS]:
            rec = {}
            title = _child_text(it, "title")
            if title:
                rec["title"] = _clean(title, 512)
            # atom <link href> is attribute-carried; prefer
            # rel=alternate, else the first link
            link = ""
            for ln in it.element_children():
                if ln.tag != "link":
                    continue
                href = (ln.attrs.get("href") or "").strip()
                if not href:
                    continue
                rel = (ln.attrs.get("rel") or "alternate").strip().lower()
                if rel == "alternate":
                    link = href
                    break
                link = link or href
            if link:
                rec["link"] = link[:MAX_TEXT]
            pub = _child_text(it, "published", "updated")
            if pub:
                rec["published"] = pub[:64]
            desc = _child_text(it, "summary", "content")
            if desc:
                rec["summary"] = _clean(desc)
            cats = [(c.attrs.get("term") or "").strip()
                    for c in it.element_children()
                    if c.tag == "category"][:8]
            cats = [c[:64] for c in cats if c]
            if cats:
                rec["categories"] = cats
            for au in it.element_children():
                if au.tag == "author":
                    name = _child_text(au, "name") or \
                        au.text_content().strip()
                    if name:
                        rec["author"] = name[:128]
                    break
            if rec:
                items.append(rec)

    out = {"content_type": "feed", "kind": kind, "items": items}
    if feed_title:
        out["title"] = _clean(feed_title, 512)
    if lang:
        out["lang"] = lang[:16]
    if len(nodes) > len(items):
        out["items_truncated"] = len(nodes) - len(items)
    return out


def feed_main_text(extraction: dict) -> str:
    """Feed record -> main_text: the title line plus one line per item
    ('title — summary'), so the text-side corpus ops (dedup, quality,
    language id) see feed documents too."""
    lines: list = []
    title = extraction.get("title")
    if title:
        lines.append(title)
    for it in extraction.get("items", ()):
        t = it.get("title") or ""
        s = it.get("summary") or ""
        line = f"{t} — {s}" if t and s else (t or s)
        if line:
            lines.append(line)
    for o in extraction.get("outlines", ()):
        t = o.get("title")
        if t:
            lines.append(t)
    return "\n".join(lines)
