#!/usr/bin/env python3
"""Generate golden chunker outputs by RUNNING the reference implementation
(read-only import from /root/reference) on our own fixture documents.

This does not copy reference code into the engine — it executes it once,
offline, to capture expected outputs for ScalaTest parity specs
(src/test/resources/chunk_golden.json).
"""
import sys, json, io, contextlib

sys.path.insert(0, "/root/reference")

from src.chunking import get_all_chunkers  # noqa: E402

DOCS = {
    "fixture/structured.md": """# Orbital Mechanics Primer

Satellites trade altitude for speed. A lower orbit means a faster period! Drag
matters below six hundred kilometers. Station keeping burns correct the decay.

## Transfer Windows

A Hohmann transfer uses two burns. The first raises apogee. The second
circularizes at the target. Plane changes are expensive? Yes, combine them with
the apogee burn when possible.

### Delta-V Budgets

Missions budget margin for dispersions. Upper stages under-perform sometimes.

## Ground Segment

| station | band | dishes |
| goldstone | x | 3 |
| canberra | s | 2 |

Telemetry arrives in frames. Frames carry packets. Packets carry parameters.
""",
    "fixture/longtext.md": " ".join(
        f"Sentence number {i} talks about topic {i % 7} and adds detail item {i * 3}."
        for i in range(200)
    ),
    "fixture/plain.md": "a short plain note with no punctuation and no structure",
    "fixture/tables.md": "intro line before tables\n"
        + "\n".join(f"| row{i} | val{i} | extra{i} |" for i in range(40))
        + "\nclosing remarks after the table. final sentence here.",
    # edge cases: trailing whitespace after punctuation (re.split keeps a
    # trailing empty), consecutive headings (section with no content is
    # dropped), empty paragraphs, tabs, unicode, heading-only doc
    "fixture/edge_trailing.md": "First sentence ends here. Second one too! ",
    "fixture/edge_headings.md": "# A\n## B\n### C\nonly the last heading has content.\n# D\n\ntail after D.",
    "fixture/edge_blank_paras.md": "para one.\n\n\n\npara two after empty paragraphs.\n\n   \n\npara three.",
    "fixture/edge_tabs.md": "col1\tcol2\tcol3\nvalue\twith\ttabs. and a sentence? plus unicode—dashes café.",
    "fixture/edge_long_single.md": "word " * 3000,  # one 3000-word "sentence" > chunk_size
    "fixture/edge_mixed_table.md": "| a | b |\ntext between. more text!\n| c | d |\n| e | f |",
    "fixture/edge_crlf.md": "# Title\r\n\r\nFirst line.\r\nSecond line!\r\n\r\n## Sub\r\ncontent here.\r\n",
}

rows = []
for name, chunker in get_all_chunkers().items():
    for src, text in DOCS.items():
        with contextlib.redirect_stderr(io.StringIO()):
            chunks = chunker.chunk(text, src)
        for c in chunks:
            m = c.metadata
            rows.append({
                "strategy": c.strategy,
                "source_file": c.source_file,
                "chunk_id": c.chunk_id,
                "chunk_index": c.chunk_index,
                "content": c.content,
                "chunk_size": m.get("chunk_size"),
                "sentence_count": m.get("sentence_count"),
                "level": None if m.get("level") is None else str(m.get("level")),
                "heading": m.get("heading") if m.get("heading") else None,
                "is_table": m.get("is_table"),
                "chunk_type": m.get("chunk_type"),
                "merged": m.get("merged"),
            })

with open("src/test/resources/chunk_golden.json", "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
with open("src/test/resources/chunk_docs.json", "w") as f:
    for src, text in DOCS.items():
        f.write(json.dumps({"source_file": src, "content": text}) + "\n")
print(f"wrote {len(rows)} golden chunks")
