// EAMG-TPU native data loader.
//
// Streams a corpus CSV (file,key_signature,tokens — the reference trainer
// input schema, SURVEY.md §3.5) and explodes the JSON-encoded Scheme-A
// token column into Scheme-B2/B3 integer ids (the hot host-side loop of
// train/train_large2.py:48-65 and train/train_no_inst.py:54-79), at C++
// speed. Exposed through a C ABI consumed with ctypes
// (eamg_tpu/tools/native_loader.py); bit-identical to the Python
// tokenizer, including the reference's duration-parse bug when
// strict_parity=1.
//
// Build: g++ -O3 -shared -fPIC -o libeamg_native.so eamg_native.cpp

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------- CSV parsing

// Read one CSV record (handles quoted fields with "" escapes and embedded
// newlines). Returns false on EOF.
bool read_record(std::istream& in, std::vector<std::string>& fields) {
  fields.clear();
  std::string field;
  bool in_quotes = false, any = false;
  int c;
  while ((c = in.get()) != EOF) {
    any = true;
    if (in_quotes) {
      if (c == '"') {
        if (in.peek() == '"') { field.push_back('"'); in.get(); }
        else in_quotes = false;
      } else field.push_back(static_cast<char>(c));
    } else {
      if (c == '"') in_quotes = true;
      else if (c == ',') { fields.push_back(field); field.clear(); }
      else if (c == '\n') { fields.push_back(field); return true; }
      else if (c != '\r') field.push_back(static_cast<char>(c));
    }
  }
  if (any) { fields.push_back(field); return true; }
  return false;
}

// ------------------------------------------- JSON string-array parsing

// Parse a JSON array of strings (the tokens column). Minimal but correct
// for the corpus format: escapes \" \\ \/ \n \t \r \uXXXX (BMP).
void append_utf8(std::string& s, unsigned cp) {
  if (cp < 0x80) s.push_back(static_cast<char>(cp));
  else if (cp < 0x800) {
    s.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    s.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

bool parse_json_string_array(const std::string& js,
                             std::vector<std::string>& out) {
  out.clear();
  size_t i = 0, n = js.size();
  while (i < n && js[i] != '[') ++i;
  if (i == n) return false;
  ++i;
  while (i < n) {
    while (i < n && (js[i] == ' ' || js[i] == ',' || js[i] == '\n')) ++i;
    if (i < n && js[i] == ']') return true;
    if (i >= n || js[i] != '"') return false;
    ++i;
    std::string s;
    while (i < n && js[i] != '"') {
      if (js[i] == '\\' && i + 1 < n) {
        char e = js[i + 1];
        i += 2;
        switch (e) {
          case 'n': s.push_back('\n'); break;
          case 't': s.push_back('\t'); break;
          case 'r': s.push_back('\r'); break;
          case 'u': {
            if (i + 4 <= n) {
              unsigned cp = std::strtoul(js.substr(i, 4).c_str(), nullptr,
                                         16);
              append_utf8(s, cp);
              i += 4;
            }
            break;
          }
          default: s.push_back(e);
        }
      } else s.push_back(js[i++]);
    }
    ++i;  // closing quote
    out.push_back(std::move(s));
  }
  return false;
}

// ------------------------------------------------------ token semantics

const int NOTE_BASE[7] = {9, 11, 0, 2, 4, 5, 7};  // A B C D E F G

// pitch text -> MIDI number; 60 on no-match (train_large2.py:34-43).
// Matches the reference regex ([A-Ga-g])([#b-]?)(-?\d+)$ — '-' may be a
// flat OR the octave sign; the regex binds it as the accidental only when
// digits follow.
int pitch_to_midi(const std::string& txt) {
  size_t a = 0, b = txt.size();
  while (a < b && std::isspace(static_cast<unsigned char>(txt[a]))) ++a;
  while (b > a && std::isspace(static_cast<unsigned char>(txt[b - 1]))) --b;
  if (a >= b) return 60;
  size_t i = a;
  char root = txt[i];
  if (!((root >= 'A' && root <= 'G') || (root >= 'a' && root <= 'g')))
    return 60;
  ++i;
  int semitone = NOTE_BASE[(std::toupper(root) - 'A')];
  int acc = 0;
  // UTF-8 ♯ (E2 99 AF) / ♭ (E2 99 AD) — in the reference's accidental set
  // ({"#","♯"} / {"b","-","♭"}, train_large2.py:38-41)
  if (i + 2 < b && (unsigned char)txt[i] == 0xE2
      && (unsigned char)txt[i + 1] == 0x99
      && ((unsigned char)txt[i + 2] == 0xAF
          || (unsigned char)txt[i + 2] == 0xAD)) {
    acc = (unsigned char)txt[i + 2] == 0xAF ? 1 : -1;
    i += 3;
  } else if (i < b && (txt[i] == '#' || txt[i] == 'b' || txt[i] == '-')) {
    // '-' counts as flat only if what remains still parses as an integer
    // with optional leading '-', mirroring the greedy regex.
    char c = txt[i];
    size_t j = i + 1;
    size_t k = j;
    if (k < b && txt[k] == '-') ++k;
    bool digits = k < b;
    for (size_t m = k; m < b; ++m)
      if (!std::isdigit(static_cast<unsigned char>(txt[m]))) {
        digits = false;
        break;
      }
    if (digits) {
      if (c == '#') acc = 1;
      else acc = -1;
      i = j;
    }
  }
  // octave: optional '-', digits to end
  size_t k = i;
  if (k < b && txt[k] == '-') ++k;
  if (k >= b) return 60;
  for (size_t m = k; m < b; ++m)
    if (!std::isdigit(static_cast<unsigned char>(txt[m]))) return 60;
  int octv = std::atoi(txt.substr(i, b - i).c_str());
  int midi = (octv + 1) * 12 + semitone + acc;
  if (midi < 0) midi = 0;
  if (midi > 127) midi = 127;
  return midi;
}

// key text -> 0..23 (train_no_inst.py:43-50); 0 on no-match.
int key_to_idx(const std::string& txt) {
  size_t i = 0, n = txt.size();
  while (i < n && std::isspace(static_cast<unsigned char>(txt[i]))) ++i;
  if (i >= n) return 0;
  char root = txt[i];
  if (!((root >= 'A' && root <= 'G') || (root >= 'a' && root <= 'g')))
    return 0;
  ++i;
  int s = NOTE_BASE[(std::toupper(root) - 'A')];
  if (i < n && (txt[i] == '#' )) { s += 1; ++i; }
  else if (i < n && (txt[i] == 'b' || txt[i] == '-')) { s -= 1; ++i; }
  else if (i + 2 < n && (unsigned char)txt[i] == 0xE2) {
    // UTF-8 ♯ (E2 99 AF) / ♭ (E2 99 AD)
    unsigned char c2 = txt[i + 1], c3 = txt[i + 2];
    if (c2 == 0x99 && c3 == 0xAF) { s += 1; i += 3; }
    else if (c2 == 0x99 && c3 == 0xAD) { s -= 1; i += 3; }
  }
  while (i < n && (txt[i] == ' ' || txt[i] == '_' || txt[i] == '-')) ++i;
  std::string mode;
  for (; i < n && std::isalpha(static_cast<unsigned char>(txt[i])); ++i)
    mode.push_back(std::tolower(txt[i]));
  int pc = ((s % 12) + 12) % 12;
  if (mode == "minor") return pc + 12;
  if (mode == "major") return pc;
  return 0;
}

struct Layout {
  // id layout for Scheme B2/B3 (train_large2.py:19-29 / train_no_inst
  // .py:22-29): [PAD][START_SEQ][END_SEQ][NOTE] (+BPM,KEY for B3) P T DUR
  int pad = 0, start = 1, end = 2, note = 3;
  int bpm0 = -1, key0 = -1, p0, t0, dur0;
  int min_bpm = 20, max_bpm = 250, max_tick = 4095, res_ms = 50;

  static Layout b2(int res_ms, int max_tick) {
    Layout L;
    L.res_ms = res_ms;
    L.max_tick = max_tick;
    L.p0 = 4;
    L.t0 = L.p0 + 128;
    L.dur0 = L.t0 + max_tick + 1;
    return L;
  }
  static Layout b3(int res_ms, int max_tick, int min_bpm, int max_bpm) {
    Layout L;
    L.res_ms = res_ms;
    L.max_tick = max_tick;
    L.min_bpm = min_bpm;
    L.max_bpm = max_bpm;
    L.bpm0 = 4;
    L.key0 = L.bpm0 + (max_bpm - min_bpm + 1);
    L.p0 = L.key0 + 24;
    L.t0 = L.p0 + 128;
    L.dur0 = L.t0 + max_tick + 1;
    return L;
  }
  int bucket(double ms) const {
    int t = static_cast<int>(std::nearbyint(ms / res_ms));
    return t > max_tick ? max_tick : (t < 0 ? 0 : t);
  }
};

bool starts_with(const std::string& s, const char* p) {
  return s.rfind(p, 0) == 0;
}

// split on single spaces like Python str.split()
void split_ws(const std::string& s, std::vector<std::string>& parts) {
  parts.clear();
  size_t i = 0, n = s.size();
  while (i < n) {
    while (i < n && std::isspace(static_cast<unsigned char>(s[i]))) ++i;
    size_t j = i;
    while (j < n && !std::isspace(static_cast<unsigned char>(s[j]))) ++j;
    if (j > i) parts.push_back(s.substr(i, j - i));
    i = j;
  }
}

// value after "NAME:" up to a trailing bracket: parts[k].split(":")[1]
std::string after_colon(const std::string& s) {
  size_t c = s.find(':');
  return c == std::string::npos ? std::string() : s.substr(c + 1);
}

void explode_row(const std::vector<std::string>& toks, const Layout& L,
                 bool with_controls, bool strict_parity, int seq_len,
                 std::vector<int32_t>& out) {
  out.clear();
  out.push_back(L.start);
  int bpm_tok = -1, key_tok = -1;
  std::vector<std::string> parts;
  for (const auto& t : toks) {
    if (with_controls && starts_with(t, "[BPM]")) {
      split_ws(t, parts);
      if (parts.size() >= 2) {
        int bpm = static_cast<int>(std::nearbyint(std::atof(
            parts.back().c_str())));
        if (bpm < L.min_bpm) bpm = L.min_bpm;
        if (bpm > L.max_bpm) bpm = L.max_bpm;
        bpm_tok = L.bpm0 + (bpm - L.min_bpm);
      }
    } else if (with_controls && starts_with(t, "[KEY_SIGNATURE]")) {
      std::string rest = t.substr(std::strlen("[KEY_SIGNATURE]"));
      key_tok = L.key0 + key_to_idx(rest);
    } else if (starts_with(t, "[NOTE]")) {
      split_ws(t, parts);
      if (parts.size() < 5) continue;
      // parts: [NOTE] [PITCH:x] [START:s] [END:e] [DURATION:d]
      std::string pitch_s = after_colon(parts[1]);
      if (!pitch_s.empty()) pitch_s.pop_back();            // strip ']'
      std::string start_s = after_colon(parts[2]);
      if (!start_s.empty()) start_s.pop_back();
      std::string dur_s = after_colon(parts[4]);
      double dur;
      if (strict_parity) {
        // reference bug: [:-2] strips ']' AND the final digit
        // (train_large2.py:52); float("0.") == 0.0, float("") -> 0 here
        std::string d = dur_s.size() >= 2
            ? dur_s.substr(0, dur_s.size() - 2) : std::string();
        dur = d.empty() ? 0.0 : std::atof(d.c_str());
      } else {
        std::string d = dur_s;
        while (!d.empty() && d.back() == ']') d.pop_back();
        dur = std::atof(d.c_str());
      }
      double start = std::atof(start_s.c_str());
      out.push_back(L.note);
      out.push_back(L.p0 + pitch_to_midi(pitch_s));
      out.push_back(L.t0 + L.bucket(start * 1000.0));
      out.push_back(L.dur0 + L.bucket(dur * 1000.0));
    }
  }
  if (with_controls) {
    // inserted right after START (train_no_inst.py:80-82)
    std::vector<int32_t> head;
    if (bpm_tok >= 0) head.push_back(bpm_tok);
    if (key_tok >= 0) head.push_back(key_tok);
    out.insert(out.begin() + 1, head.begin(), head.end());
  }
  out.push_back(L.end);
  if (static_cast<int>(out.size()) > seq_len) out.resize(seq_len);
}

}  // namespace

extern "C" {

// Explodes the corpus at `path` into a [rows, seq_len] int32 matrix
// (PAD-padded) plus per-row true lengths. Caller frees both with
// eamg_free. scheme: 2 = B2, 3 = B3. Returns rows written, or -1 on error.
int eamg_explode_csv(const char* path, int max_rows, int seq_len,
                     int res_ms, int max_tick, int scheme,
                     int strict_parity, int min_bpm, int max_bpm,
                     int32_t** out_data, int32_t** out_lens) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return -1;
  Layout L = scheme == 3 ? Layout::b3(res_ms, max_tick, min_bpm, max_bpm)
                         : Layout::b2(res_ms, max_tick);
  std::vector<std::string> fields, toks;
  if (!read_record(in, fields)) return -1;  // header
  int tokens_col = -1;
  for (size_t i = 0; i < fields.size(); ++i)
    if (fields[i] == "tokens") tokens_col = static_cast<int>(i);
  if (tokens_col < 0) return -1;

  std::vector<int32_t> data, lens, row;
  int rows = 0;
  while ((max_rows < 0 || rows < max_rows) && read_record(in, fields)) {
    if (static_cast<int>(fields.size()) <= tokens_col) continue;
    if (!parse_json_string_array(fields[tokens_col], toks)) continue;
    explode_row(toks, L, scheme == 3, strict_parity != 0, seq_len, row);
    lens.push_back(static_cast<int32_t>(row.size()));
    row.resize(seq_len, L.pad);
    data.insert(data.end(), row.begin(), row.end());
    ++rows;
  }
  *out_data = static_cast<int32_t*>(std::malloc(data.size() * 4));
  *out_lens = static_cast<int32_t*>(std::malloc(lens.size() * 4));
  std::memcpy(*out_data, data.data(), data.size() * 4);
  std::memcpy(*out_lens, lens.data(), lens.size() * 4);
  return rows;
}

void eamg_free(void* p) { std::free(p); }

}  // extern "C"
