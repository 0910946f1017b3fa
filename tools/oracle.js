// Golden-output oracle: runs the UNMODIFIED reference
// (/root/reference/lib/Boilerpipe.js, the compiled ground truth) over
// interleaved-span documents and emits the expected output span
// sequences our PySpark pipeline must match byte-for-byte.
//
// usage: node tools/oracle.js <ExtractorName> < docs.jsonl > golden.jsonl
//   stdin : one JSON object per line {doc_id, spans:[{kind,text,media_ref,offset}]}
//   stdout: one JSON object per line {doc_id, title, spans:[{kind,text,media_ref,order}], error}
//
// Attribution contract (FIXTURES.md section 3): every text span is a
// self-contained run of block-level elements, so per-span block counts
// are exact: block k originates in the span whose cumulative Unfiltered
// block count first exceeds k.  Prefix parses are equivalent to
// mid-stream counting because the buffer is empty at span boundaries.

'use strict';
console.log = (...a) => process.stderr.write(a.join(' ') + '\n'); // the
// reference console.logs a warning on nested <a> before crashing;
// keep stdout clean JSONL.

const Boilerpipe = require('/root/reference/lib/Boilerpipe.js');

const extractor = process.argv[2] || 'ArticleExtractor';

function processDoc(doc) {
  const textSpans = doc.spans.filter(s => s.kind === 'text')
    .sort((a, b) => a.offset - b.offset);
  const media = doc.spans.filter(s => s.kind !== 'text')
    .sort((a, b) => a.offset - b.offset);
  const html = textSpans.map(s => s.text || '').join('');

  let result;
  try {
    result = Boilerpipe.documentFromHTML(html, Boilerpipe[extractor] || extractor);
  } catch (e) {
    return {doc_id: doc.doc_id, title: '', spans: [], error: 'reference_throw'};
  }

  // per-span cumulative block counts via prefix parses (Unfiltered)
  const cum = [];
  try {
    let prefix = '';
    for (const s of textSpans) {
      prefix += s.text || '';
      cum.push(Boilerpipe.documentFromHTML(prefix, Boilerpipe.Unfiltered)
        .textBlocks.length);
    }
  } catch (e) {
    return {doc_id: doc.doc_id, title: '', spans: [], error: 'reference_throw'};
  }

  const spanOffsetOfBlock = (k) => {
    for (let i = 0; i < cum.length; i++) {
      if (k < cum[i]) return textSpans[i].offset;
    }
    return textSpans.length ? textSpans[textSpans.length - 1].offset : 0;
  };

  const keyed = [];
  for (const tb of result.textBlocks) {
    if (!tb.isContent) continue;
    keyed.push({k0: spanOffsetOfBlock(tb.offsetStart), k1: tb.offsetStart,
                kind: 'text', text: tb.text, media_ref: null});
  }
  for (const m of media) {
    keyed.push({k0: m.offset, k1: -1, kind: m.kind, text: null,
                media_ref: m.media_ref});
  }
  keyed.sort((a, b) => (a.k0 - b.k0) || (a.k1 - b.k1));

  const spans = keyed.map((s, i) => ({
    kind: s.kind, text: s.text, media_ref: s.media_ref, order: i,
  }));
  return {doc_id: doc.doc_id, title: result.title, spans, error: null};
}

let buf = '';
process.stdin.setEncoding('utf8');
process.stdin.on('data', (d) => { buf += d; });
process.stdin.on('end', () => {
  const out = [];
  for (const line of buf.split('\n')) {
    if (!line.trim()) continue;
    out.push(JSON.stringify(processDoc(JSON.parse(line))));
  }
  process.stdout.write(out.join('\n') + '\n');
});
