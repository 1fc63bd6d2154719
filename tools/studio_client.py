#!/usr/bin/env python3
"""Push transcriptions to a LinTO-Studio-compatible conversation manager.

Counterpart of reference tools/studio/post_conversation.py (431 ln, pycurl)
and remove_conversations_with_tag.py: authenticates, creates a conversation
from an audio file + canonical transcription JSON, lists/deletes by tag.
Built on ssak_tpu.remote's urllib helpers.

    studio_client.py post <server> <email> <password> <audio> <transcription.json> --name X --tag Y
    studio_client.py delete-by-tag <server> <email> <password> <tag>
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def login(server: str, email: str, password: str) -> str:
    from ssak_tpu.remote.client import http_post

    status, body = http_post(server.rstrip("/") + "/auth/login", json_body={"email": email, "password": password})
    if status not in (200, 201):
        raise RuntimeError(f"login failed: {status}")
    return json.loads(body)["auth_token"]


def post_conversation(server, token, audio_path, transcription, name=None, tags=(), lang="fr-FR"):
    from ssak_tpu.remote.client import http_post

    with open(audio_path, "rb") as f:
        audio = f.read()
    fields = {
        "name": name or os.path.basename(audio_path),
        "lang": lang,
        "transcriptionConfig": json.dumps({}),
        "segmentCharSize": "2000",
        "transcription": json.dumps(transcription, ensure_ascii=False),
    }
    if tags:
        fields["tags"] = ",".join(tags)
    status, body = http_post(
        server.rstrip("/") + "/api/conversations/import?type=transcription",
        fields=fields,
        files={"file": (os.path.basename(audio_path), audio, "audio/wav")},
        headers={"Authorization": f"Bearer {token}"},
    )
    if status not in (200, 201):
        raise RuntimeError(f"post failed: {status} {body[:300]}")
    return json.loads(body)


def list_conversations(server, token):
    from ssak_tpu.remote.client import http_get

    status, body = http_get(server.rstrip("/") + "/api/conversations", headers={"Authorization": f"Bearer {token}"})
    return json.loads(body) if status == 200 else []


def delete_conversation(server, token, conv_id):
    import urllib.request

    req = urllib.request.Request(
        server.rstrip("/") + f"/api/conversations/{conv_id}",
        headers={"Authorization": f"Bearer {token}"},
        method="DELETE",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status in (200, 204)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("post")
    for a in ("server", "email", "password", "audio", "transcription"):
        s.add_argument(a)
    s.add_argument("--name", default=None)
    s.add_argument("--tag", action="append", default=[])
    s.add_argument("--lang", default="fr-FR")

    s = sub.add_parser("delete-by-tag")
    for a in ("server", "email", "password", "tag"):
        s.add_argument(a)

    args = p.parse_args(argv)
    token = login(args.server, args.email, args.password)
    if args.cmd == "post":
        with open(args.transcription, encoding="utf-8") as f:
            tr = json.load(f)
        out = post_conversation(args.server, token, args.audio, tr, name=args.name, tags=args.tag, lang=args.lang)
        print(json.dumps(out))
    else:
        n = 0
        for conv in list_conversations(args.server, token):
            if args.tag in (conv.get("tags") or []):
                delete_conversation(args.server, token, conv.get("_id") or conv.get("id"))
                n += 1
        print(f"deleted {n} conversations")


if __name__ == "__main__":
    main()
