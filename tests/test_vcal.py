"""iCalendar/vCard extraction (operators/vcal.py): the RFC 5545/6350
content-line grammar — unfolding, quoted parameters, escaping, the
vCard 2.1 quoted-printable conventions — plus typed boundaries and
the document_extract routing."""

from __future__ import annotations

import pytest

from evm_archive_spark.operators.vcal import (
    VcalError,
    ics_to_text,
    is_vcal,
    vcal_to_text,
    vcard_to_text,
)

ICS = (
    b"BEGIN:VCALENDAR\r\n"
    b"VERSION:2.0\r\n"
    b"PRODID:-//Test//EN\r\n"
    b"BEGIN:VEVENT\r\n"
    b"UID:evt-1@example.com\r\n"
    b"DTSTART;TZID=Europe/Berlin:20260816T100000\r\n"
    b"SUMMARY:Team sync\\, weekly\r\n"
    b"DESCRIPTION:Line one\\nLine two with a ver\r\n"
    b" y long folded continuation\r\n"
    b"LOCATION:Room 5\\; Floor 2\r\n"
    b"BEGIN:VALARM\r\n"
    b"TRIGGER:-PT15M\r\n"
    b"END:VALARM\r\n"
    b"END:VEVENT\r\n"
    b"END:VCALENDAR\r\n"
)


def test_ics_linearization():
    text = ics_to_text(ICS)
    assert "VEVENT:" in text and "VALARM:" in text
    assert "SUMMARY: Team sync, weekly" in text
    assert "DTSTART[Europe/Berlin]: 20260816T100000" in text
    assert "Line one\nLine two with a very long folded continuation" \
        in text
    assert "LOCATION: Room 5; Floor 2" in text
    assert "PRODID" not in text and "VERSION" not in text
    # quoted parameter values protect colons and semicolons
    q = (b"BEGIN:VCALENDAR\nBEGIN:VEVENT\n"
         b'ORGANIZER;CN="Smith; Dr.":mailto:o@x\n'
         b"END:VEVENT\nEND:VCALENDAR\n")
    assert "ORGANIZER: mailto:o@x" in ics_to_text(q)


def test_vcard_multi_and_21_conventions():
    vcf = (
        b"BEGIN:VCARD\r\nVERSION:2.1\r\n"
        b"FN;ENCODING=QUOTED-PRINTABLE;CHARSET=UTF-8:"
        b"J=C3=BCrgen M=C3=BCller\r\n"
        b"NOTE;ENCODING=QUOTED-PRINTABLE:soft break he=\r\n"
        b"re continues\r\n"
        b"PHOTO;ENCODING=b;TYPE=JPEG:AAAABBBBCCCC\r\n"
        b"END:VCARD\r\n"
        b"BEGIN:VCARD\r\nVERSION:4.0\r\nFN:Second Person\r\n"
        b"END:VCARD\r\n"
    )
    text = vcard_to_text(vcf)
    assert "FN: Jürgen Müller" in text
    assert "NOTE: soft break here continues" in text
    assert "PHOTO: <b64:12>" in text
    assert text.count("FN:") == 2
    assert "\n\n" in text                        # card separator


def test_dispatch_and_typed():
    assert vcal_to_text(ICS)[0] == "ics"
    assert is_vcal(b"  begin:vcard\nEND:VCARD")
    assert not is_vcal(b"BEGIN:SOMETHING\n")
    with pytest.raises(VcalError, match="not an iCalendar"):
        vcal_to_text(b"plain text")
    with pytest.raises(VcalError, match="unbalanced|unterminated"):
        ics_to_text(b"BEGIN:VCALENDAR\nBEGIN:VEVENT\nEND:VCALENDAR\n")
    with pytest.raises(VcalError, match="unterminated"):
        ics_to_text(b"BEGIN:VCALENDAR\nSUMMARY:x\n")
    with pytest.raises(VcalError, match="without ':'"):
        ics_to_text(b"BEGIN:VCALENDAR\nJUNKLINE\nEND:VCALENDAR\n")
    # a VCARD payload refused by the ICS face and vice versa
    with pytest.raises(VcalError, match="not a VCALENDAR"):
        ics_to_text(b"BEGIN:VCARD\nEND:VCARD\n")
    with pytest.raises(VcalError, match="not a VCARD"):
        vcard_to_text(ICS)


def test_extract_routing():
    from evm_archive_spark.operators.extract import document_extract
    from evm_archive_spark.session import get_spark

    spark = get_spark("test-vcal")
    df = spark.createDataFrame(
        [(1, bytearray(ICS)),
         (2, bytearray(b"BEGIN:VCARD\r\nVERSION:4.0\r\nFN:A B\r\n"
                       b"END:VCARD\r\n"))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in
            document_extract(df).collect()}
    assert rows[1]["format"] == "ics"
    assert "SUMMARY: Team sync, weekly" in rows[1]["text"]
    assert rows[2]["format"] == "vcard"
    assert "FN: A B" in rows[2]["text"]


def test_value_containing_begin_vcard_not_missplit():
    # "BEGIN:VCARD" inside a folded property VALUE must not split the
    # card (ADVICE r11: the split is anchored to line starts)
    vcf = (
        b"BEGIN:VCARD\r\nVERSION:4.0\r\nFN:A B\r\n"
        b"NOTE:the literal text \r\n"
        b" BEGIN:VCARD appears folded mid-value\r\n"
        b"END:VCARD\r\n"
        b"BEGIN:VCARD\r\nVERSION:4.0\r\nFN:C D\r\nEND:VCARD\r\n"
    )
    text = vcard_to_text(vcf)
    assert "FN: A B" in text and "FN: C D" in text
    assert "BEGIN:VCARD appears folded mid-value" in text
    assert text.count("\n\n") == 1  # exactly two cards
