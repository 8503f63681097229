"""multipart/form-data encoder (S12 — ``HZ.Crawler.Common/Net/MultiParts.cs:9-151``).

The reference builds upload bodies by streaming text parts
(``TxtPart.ToStream``: ``--boundary\\r\\nContent-Disposition: form-data;
name=...\\r\\n\\r\\n<data>``) and file parts (``FilePart``: adds ``filename`` +
``Content-Type`` — ``text/plain`` for ``*.txt``, ``application/octet-stream``
otherwise) separated by ``\\r\\n``, terminated by ``--boundary--\\r\\n``, with a
fixed WebKit-style boundary. Re-expressed as pure functions over bytes — the
encoder is a scalar building block (e.g. for the image-upload sink payloads),
not a stage.
"""

from __future__ import annotations

from dataclasses import dataclass

# the reference pins a constant boundary (MultiParts.cs:36); callers may
# override per request
DEFAULT_BOUNDARY = "----WebKitFormBoundarymOI4BzLWbEqLlrbC"


@dataclass
class TxtPart:
    name: str
    data: str

    def encode(self, boundary: str, encoding: str) -> bytes:
        header = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{self.name}"\r\n\r\n'
            f"{self.data}"
        )
        return header.encode(encoding)


@dataclass
class FilePart:
    name: str
    filename: str
    data: bytes

    def content_type(self) -> str:
        # FilePart.ToStream content-type rule (MultiParts.cs:128-133)
        return "text/plain" if self.filename.endswith("txt") else "application/octet-stream"

    def encode(self, boundary: str, encoding: str) -> bytes:
        header = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{self.name}"; '
            f'filename="{self.filename}"\r\n'
            f"Content-Type: {self.content_type()}\r\n\r\n"
        )
        return header.encode(encoding) + self.data


def encode_multipart(
    parts: list[TxtPart | FilePart],
    boundary: str = DEFAULT_BOUNDARY,
    encoding: str = "utf-8",
) -> tuple[bytes, str]:
    """Parts → (body bytes, Content-Type header value). Layout mirrors
    ``MultiParts.ToStream``: each part then CRLF, then the end boundary."""
    chunks: list[bytes] = []
    for p in parts:
        chunks.append(p.encode(boundary, encoding))
        chunks.append(b"\r\n")
    chunks.append(f"--{boundary}--\r\n".encode(encoding))
    return b"".join(chunks), f"multipart/form-data; boundary={boundary}"
