"""Web scraping helpers for corpus harvesting.

Counterpart of reference ssak/utils/scraping.py (scraping_driver:12,
find_all_links:29, download_link_to_file:48) without the selenium
dependency: static-page scraping with urllib + html.parser (covers the
caption/document harvesting patterns in the reference's tools/scraping;
JS-rendered pages would need a browser driver, which this environment
doesn't ship).
"""

import os
import re
import urllib.parse
import urllib.request
from html.parser import HTMLParser

DEFAULT_HEADERS = {"User-Agent": "Mozilla/5.0 (compatible; ssak-tpu/0.1)"}


def fetch_page(url: str, timeout: float = 30.0) -> str:
    req = urllib.request.Request(url, headers=DEFAULT_HEADERS)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.read().decode(charset, errors="replace")


class _LinkParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.links = []

    def handle_starttag(self, tag, attrs):
        if tag in ("a", "audio", "source", "video"):
            for name, value in attrs:
                if name in ("href", "src") and value:
                    self.links.append(value)


def find_all_links(url_or_html: str, base_url: str = None, pattern: str = None):
    """All links on a page (absolute URLs), optionally regex-filtered."""
    if url_or_html.startswith(("http://", "https://")):
        html = fetch_page(url_or_html)
        base_url = base_url or url_or_html
    else:
        html = url_or_html
    parser = _LinkParser()
    parser.feed(html)
    links = [urllib.parse.urljoin(base_url, l) if base_url else l for l in parser.links]
    if pattern:
        rx = re.compile(pattern)
        links = [l for l in links if rx.search(l)]
    seen = set()
    out = []
    for l in links:
        if l not in seen:
            seen.add(l)
            out.append(l)
    return out


def download_link_to_file(url: str, output_path: str, overwrite: bool = False, timeout: float = 300.0) -> str:
    if os.path.exists(output_path) and not overwrite:
        return output_path
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    req = urllib.request.Request(url, headers=DEFAULT_HEADERS)
    tmp = output_path + ".part"
    with urllib.request.urlopen(req, timeout=timeout) as resp, open(tmp, "wb") as f:
        while True:
            chunk = resp.read(1 << 16)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, output_path)
    return output_path


def extract_text(html: str) -> str:
    """Visible text from an HTML page (script/style stripped)."""

    class _Text(HTMLParser):
        def __init__(self):
            super().__init__()
            self.parts = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, data):
            if not self._skip and data.strip():
                self.parts.append(data.strip())

    p = _Text()
    p.feed(html)
    return "\n".join(p.parts)
