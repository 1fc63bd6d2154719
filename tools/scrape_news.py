#!/usr/bin/env python3
"""Scrape information/news websites into a text corpus.

Counterpart of the reference's tools/scraping/scrape_infos_fr.py (site
scrapers for 20minutes/huffingtonpost/etc. built on selenium+bs4): same
capability with the stdlib only — article links are discovered from seed
pages by URL pattern, article pages are reduced to headline + paragraph
text, one slugified .txt per article, resumable (existing slugs skipped).

Works fully offline on cached HTML files (pass file paths as seeds /
--from_files for article pages), which is also how the tests drive it;
live fetching uses ssak_tpu.utils.scraping.fetch_page (urllib).

Usage:
  scrape_news.py SEED... --output_dir corpus/ [--article_pattern REGEX]
                 [--max_articles N] [--min_words 4] [--corpus_file all.txt]
  scrape_news.py --from_files article1.html article2.html --output_dir c/
"""

import argparse
import os
import re
import sys
from html.parser import HTMLParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssak_tpu.formats.voicelab import slugify
from ssak_tpu.utils.scraping import fetch_page, find_all_links

# tags whose text is never article prose
_SKIP = {"script", "style", "nav", "footer", "header", "aside", "form", "button", "figcaption"}


class _ArticleParser(HTMLParser):
    """Collects the <h1> headline and <p> paragph text blocks."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title_parts, self.paragraphs = [], []
        self._p, self._h1 = None, False
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "p" and not self._skip_depth:
            self._p = []
        elif tag == "h1" and not self._skip_depth:
            self._h1 = True

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "p" and self._p is not None:
            text = re.sub(r"\s+", " ", " ".join(self._p)).strip()
            if text:
                self.paragraphs.append(text)
            self._p = None
        elif tag == "h1":
            self._h1 = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._p is not None:
            self._p.append(data)
        elif self._h1:
            self.title_parts.append(data.strip())


def extract_article(html: str, min_words: int = 4):
    """-> (title, [paragraphs]) keeping only prose paragraphs."""
    p = _ArticleParser()
    p.feed(html)
    title = re.sub(r"\s+", " ", " ".join(t for t in p.title_parts if t)).strip()
    paras = [t for t in p.paragraphs if len(t.split()) >= min_words]
    return title, paras


def _read_source(src: str, timeout: float = 30.0) -> str:
    if os.path.exists(src):
        with open(src, encoding="utf-8", errors="replace") as f:
            return f.read()
    return fetch_page(src, timeout=timeout)


def scrape_articles(article_sources, output_dir: str, min_words: int = 4,
                    corpus_file: str = None, verbose: bool = True):
    """Write one slug.txt per article (title line + paragraphs); returns
    the list of files written. Already-present slugs are skipped (resume)."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    corpus = open(corpus_file, "a", encoding="utf-8") if corpus_file else None
    try:
        for src in article_sources:
            try:
                html = _read_source(src)
            except Exception as e:
                if verbose:
                    print(f"skip {src}: {e}", file=sys.stderr)
                continue
            title, paras = extract_article(html, min_words=min_words)
            if not paras:
                continue
            slug = slugify(title or os.path.splitext(os.path.basename(src))[0])[:80] or "article"
            out = os.path.join(output_dir, slug + ".txt")
            if os.path.exists(out):
                continue  # resume: already scraped
            with open(out, "w", encoding="utf-8") as f:
                if title:
                    f.write(title + "\n\n")
                f.write("\n".join(paras) + "\n")
            if corpus is not None:
                for t in ([title] if title else []) + paras:
                    corpus.write(t + "\n")
            written.append(out)
            if verbose:
                print(f"{out}: {len(paras)} paragraphs", file=sys.stderr)
    finally:
        if corpus is not None:
            corpus.close()
    return written


def discover_articles(seeds, article_pattern: str, max_articles: int = None):
    """Collect article URLs from seed/category pages by URL regex."""
    urls, seen = [], set()
    for seed in seeds:
        html = _read_source(seed)
        base = None if os.path.exists(seed) else seed
        for link in find_all_links(html, base_url=base, pattern=article_pattern):
            if link not in seen:
                seen.add(link)
                urls.append(link)
            if max_articles and len(urls) >= max_articles:
                return urls
    return urls


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("seeds", nargs="*", help="seed/category pages (URLs or cached HTML files)")
    ap.add_argument("--from_files", nargs="*", default=None, help="article pages directly (skip discovery)")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--article_pattern", default=r"/article|/actu|/news|\d{4}/\d{2}", help="URL regex marking article links")
    ap.add_argument("--max_articles", type=int, default=None)
    ap.add_argument("--min_words", type=int, default=4)
    ap.add_argument("--corpus_file", default=None, help="also append all text to this flat corpus file")
    args = ap.parse_args(argv)

    sources = list(args.from_files or [])
    if args.seeds:
        sources += discover_articles(args.seeds, args.article_pattern, args.max_articles)
    if not sources:
        ap.error("no article sources (give seeds or --from_files)")
    written = scrape_articles(sources, args.output_dir, min_words=args.min_words, corpus_file=args.corpus_file)
    print(f"{len(written)} articles written to {args.output_dir}")


if __name__ == "__main__":
    main()
