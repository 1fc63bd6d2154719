"""Small host-side helpers: cache dirs, hashing, provenance.

Capability parity with reference ssak/utils/misc.py (get_cache_dir:18,
hashmd5:42, save_source_dir:48, walk_files:168, run_command:185), designed
fresh for this framework.
"""

import hashlib
import json
import os
import shutil
import subprocess


def get_cache_dir(name: str = "ssak_tpu") -> str:
    """Return (and create) a per-user cache directory.

    Fallback chain: $SSAK_TPU_CACHE > $XDG_CACHE_HOME/<name> >
    $HOME/.cache/<name> > /tmp/<name>-cache.
    """
    root = os.environ.get("SSAK_TPU_CACHE")
    if not root:
        xdg = os.environ.get("XDG_CACHE_HOME")
        home = os.environ.get("HOME")
        if xdg:
            root = os.path.join(xdg, name)
        elif home and os.access(home, os.W_OK):
            root = os.path.join(home, ".cache", name)
        else:
            root = os.path.join("/tmp", f"{name}-cache")
    os.makedirs(root, exist_ok=True)
    return root


def hashmd5(obj) -> str:
    """Deterministic md5 of an arbitrary (JSON-able or repr-able) object.

    Used for cache keys and reproducible run-directory naming.  Unlike the
    reference (pickle+md5), we hash a canonical JSON encoding so the hash is
    stable across Python versions.
    """
    try:
        payload = json.dumps(obj, sort_keys=True, default=repr)
    except TypeError:
        payload = repr(obj)
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


def walk_files(root: str, ignore_extensions=None, verbose: bool = False):
    """Yield all file paths under root (sorted, deterministic order)."""
    ignore_extensions = tuple(ignore_extensions or ())
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(filenames):
            if ignore_extensions and fn.endswith(ignore_extensions):
                continue
            yield os.path.join(dirpath, fn)


def save_source_dir(dest_dir: str) -> str:
    """Snapshot the ssak_tpu source tree into a run directory for provenance."""
    import ssak_tpu

    src = os.path.dirname(os.path.abspath(ssak_tpu.__file__))
    dest = os.path.join(dest_dir, "src", "ssak_tpu")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    shutil.copytree(src, dest, ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"))
    return dest


def run_command(cmd, check: bool = True, capture: bool = True) -> str:
    """Run a shell command, return stdout. Raises on failure when check."""
    result = subprocess.run(
        cmd,
        shell=isinstance(cmd, str),
        check=check,
        stdout=subprocess.PIPE if capture else None,
        stderr=subprocess.PIPE if capture else None,
    )
    return result.stdout.decode("utf-8", errors="replace") if capture else ""
