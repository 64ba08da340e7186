"""iCalendar / vCard extraction — from scratch, stdlib only (public
formats: RFC 5545 iCalendar, RFC 6350 vCard 4.0 + the vCard 2.1
legacy conventions).

``.ics`` invites and ``.vcf`` contact cards are constant residents of
mail dumps and crawls.  Both share the same content-line grammar:

- **unfolding**: lines end CRLF (bare LF tolerated); a line starting
  with one SPACE or HTAB continues the previous line with that one
  character removed (RFC 5545 §3.1).  vCard 2.1's QUOTED-PRINTABLE
  soft break (``=`` at end of line) also continues;
- **content lines**: ``NAME;PARAM=val;PARAM2=...:VALUE`` — parameter
  values may be double-quoted (colons/semicolons inside quotes are
  literal), property names/params are case-insensitive;
- **value unescaping**: ``\\n``/``\\N`` -> newline, ``\\,`` ``\\;``
  ``\\\\`` -> the literal (RFC 5545 §3.3.11);
- **encodings**: ``ENCODING=QUOTED-PRINTABLE`` (vCard 2.1) decodes
  =XX; ``ENCODING=b``/``BASE64`` payloads (photos, keys) render as
  ``<b64:n>`` instead of binary noise;
- **components**: BEGIN/END blocks nest (VCALENDAR > VEVENT > VALARM);
  the linearization emits one ``name: value`` line per property in
  appearance order, grouped per component with the component name as
  a header, skipping envelope noise (VERSION/PRODID/CALSCALE/BEGIN/
  END at the VCALENDAR level).

``ics_to_text`` / ``vcard_to_text`` produce the extraction lane's
text; ``document_extract`` routes ``text/calendar``, ``text/vcard``
and the BEGIN:-sniffed payloads here.

Reference parity note: the reference (SummaryDev/evm-archive) has no
document surface; this extends the training-pipeline extraction lane.
Placement: per-payload work inside mapInPandas Arrow batches.
"""

from __future__ import annotations

import re


class VcalError(ValueError):
    """Malformed or out-of-scope iCalendar/vCard payload."""


MAX_VCAL_LINES = 200_000

_SNIFF = re.compile(rb"^\s*BEGIN:(VCALENDAR|VCARD)\b", re.IGNORECASE)


def is_vcal(b: bytes) -> bool:
    return bool(_SNIFF.match(b[:64]))


def _unfold(text: str) -> list[str]:
    raw = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if len(raw) > MAX_VCAL_LINES:
        raise VcalError("line count over cap")
    out: list[str] = []
    for ln in raw:
        if ln[:1] in (" ", "\t") and out:
            out[-1] += ln[1:]
        elif out and out[-1].endswith("=") and "QUOTED-PRINTABLE" in \
                out[-1].upper().split(":", 1)[0]:
            # vCard 2.1 QP soft break: '=' at EOL joins the next line
            out[-1] = out[-1][:-1] + ln
        else:
            out.append(ln)
    return [ln for ln in out if ln.strip()]


def _split_name(line: str) -> tuple[str, dict, str]:
    """NAME;PARAMs:VALUE with quoted-parameter awareness."""
    i = 0
    in_q = False
    n = len(line)
    while i < n:
        c = line[i]
        if c == '"':
            in_q = not in_q
        elif c == ":" and not in_q:
            break
        i += 1
    if i >= n:
        raise VcalError(f"content line without ':': {line[:40]!r}")
    head, value = line[:i], line[i + 1:]
    parts: list[str] = []
    cur = []
    in_q = False
    for c in head:
        if c == '"':
            in_q = not in_q
        if c == ";" and not in_q:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    name = parts[0].strip().upper()
    params: dict[str, str] = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.strip().upper()] = v.strip().strip('"')
        else:
            # vCard 2.1 bare parameter (e.g. ;QUOTED-PRINTABLE)
            params[p.strip().upper()] = ""
    if not name:
        raise VcalError("empty property name")
    return name, params, value


_QP = re.compile(r"=([0-9A-Fa-f]{2})")


def _decode_value(params: dict, value: str) -> str:
    enc = params.get("ENCODING", "").upper()
    if enc in ("B", "BASE64") or "BASE64" in params:
        return f"<b64:{len(value.replace(' ', ''))}>"
    if enc == "QUOTED-PRINTABLE" or "QUOTED-PRINTABLE" in params:
        # =XX escapes are BYTES of the declared charset (vCard 2.1
        # default here: UTF-8), not codepoints
        raw = _QP.sub(
            lambda m: chr(int(m.group(1), 16)),
            value).encode("latin-1", "replace")
        return raw.decode(params.get("CHARSET", "utf-8") or "utf-8",
                          "replace")
    # RFC 5545 text unescaping
    out = []
    i = 0
    n = len(value)
    while i < n:
        c = value[i]
        if c == "\\" and i + 1 < n:
            nxt = value[i + 1]
            if nxt in "nN":
                out.append("\n")
            elif nxt in ",;\\":
                out.append(nxt)
            else:
                out.append(nxt)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_SKIP = {"VERSION", "PRODID", "CALSCALE", "METHOD"}


def _linearize(b: bytes, want_root: str) -> str:
    text = b.decode("utf-8", "replace")
    lines = _unfold(text)
    if not lines:
        raise VcalError("empty payload")
    name0, _p, v0 = _split_name(lines[0])
    if name0 != "BEGIN" or v0.strip().upper() != want_root:
        raise VcalError(f"payload is not a {want_root}")
    parts: list[str] = []
    stack: list[str] = []
    for ln in lines:
        name, params, value = _split_name(ln)
        if name == "BEGIN":
            comp = value.strip().upper()
            stack.append(comp)
            if comp != want_root:
                if parts:
                    parts.append("")
                parts.append(f"{comp}:")
            continue
        if name == "END":
            if not stack or stack[-1] != value.strip().upper():
                raise VcalError("unbalanced BEGIN/END")
            stack.pop()
            continue
        if not stack:
            raise VcalError("property outside any component")
        if len(stack) == 1 and want_root == "VCALENDAR":
            if name in _SKIP:
                continue
            # calendar-level properties (rare) surface too
        if name in ("VERSION",):
            continue
        val = _decode_value(params, value)
        tz = params.get("TZID")
        shown = f"{name}: {val}" if not tz else f"{name}[{tz}]: {val}"
        parts.append(shown)
    if stack:
        raise VcalError("unterminated component")
    return "\n".join(parts).strip("\n")


def ics_to_text(b: bytes) -> str:
    """Linearize a VCALENDAR: one ``NAME: value`` line per property in
    appearance order, components headed by ``VEVENT:``-style lines,
    envelope noise dropped."""
    return _linearize(b, "VCALENDAR")


def vcard_to_text(b: bytes) -> str:
    """Linearize one or more VCARDs (a .vcf file may concatenate
    many)."""
    text = b.decode("utf-8", "replace")
    # anchor to line starts: an escaped or folded property VALUE may
    # contain "BEGIN:VCARD" mid-line (folded continuations begin with
    # WSP, so a real card delimiter always starts its own line)
    cards = re.split(r"(?im)^(?=BEGIN:VCARD)",
                     text.replace("\r\n", "\n").replace("\r", "\n"))
    outs = []
    seen = False
    for c in cards:
        if not c.strip():
            continue
        if not _SNIFF.match(c.encode()[:64]):
            raise VcalError("payload is not a VCARD")
        seen = True
        outs.append(_linearize(c.encode(), "VCARD"))
    if not seen:
        raise VcalError("payload is not a VCARD")
    return "\n\n".join(outs)


def vcal_to_text(b: bytes) -> tuple[str, str]:
    """Sniff-dispatch: -> (format, text) with format 'ics' or
    'vcard'."""
    m = _SNIFF.match(b[:64])
    if not m:
        raise VcalError("not an iCalendar/vCard payload")
    if m.group(1).upper() == b"VCALENDAR":
        return "ics", ics_to_text(b)
    return "vcard", vcard_to_text(b)
