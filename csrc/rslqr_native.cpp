// rslqr_tpu native runtime helpers.
//
// TPU-native counterpart of the reference's host-side C runtime: the
// cJSON-based problem loader (src/json_utils.c), the binary-tree builder
// (src/binary_tree.c), and the arena-style problem packer (src/solver.c
// InitializeWithLQRProblem). The TPU compute path is JAX/XLA; this module
// covers the host data path: parsing reference-format JSON problem files
// and emitting packed, stacked float64 arrays ready to wrap as jnp arrays,
// plus closed-form tree index tables.
//
// Exposed via the CPython C API (no pybind11 in the image); see
// rslqr_tpu/native.py for the Python-side loader with pure-Python fallback.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal recursive-descent JSON parser (numbers, strings, arrays, objects).
// Replaces the vendored cJSON dependency (deps/CMakeLists.txt:13-22).
// ---------------------------------------------------------------------------

struct JsonValue;
using JsonPtr = std::unique_ptr<JsonValue>;

struct JsonValue {
  enum Kind { kNull, kBool, kNumber, kString, kArray, kObject } kind = kNull;
  bool b = false;
  double num = 0.0;
  std::string str;
  std::vector<JsonPtr> arr;
  std::vector<std::pair<std::string, JsonPtr>> obj;

  const JsonValue* find(const std::string& key) const {
    for (const auto& kv : obj)
      if (kv.first == key) return kv.second.get();
    return nullptr;
  }
};

class Parser {
 public:
  explicit Parser(const std::string& text) : s_(text) {}

  JsonPtr parse() {
    skip_ws();
    JsonPtr v = parse_value();
    skip_ws();
    if (pos_ != s_.size()) throw std::runtime_error("trailing JSON content");
    return v;
  }

 private:
  const std::string& s_;
  size_t pos_ = 0;

  [[noreturn]] void fail(const char* msg) {
    std::ostringstream os;
    os << "JSON parse error at offset " << pos_ << ": " << msg;
    throw std::runtime_error(os.str());
  }

  void skip_ws() {
    while (pos_ < s_.size() &&
           (s_[pos_] == ' ' || s_[pos_] == '\t' || s_[pos_] == '\n' || s_[pos_] == '\r'))
      ++pos_;
  }

  char peek() {
    if (pos_ >= s_.size()) fail("unexpected end");
    return s_[pos_];
  }

  void expect(char c) {
    if (pos_ >= s_.size() || s_[pos_] != c) fail("unexpected character");
    ++pos_;
  }

  JsonPtr parse_value() {
    skip_ws();
    char c = peek();
    if (c == '{') return parse_object();
    if (c == '[') return parse_array();
    if (c == '"') return parse_string();
    if (c == 't' || c == 'f') return parse_bool();
    if (c == 'n') return parse_null();
    return parse_number();
  }

  JsonPtr parse_object() {
    auto v = std::make_unique<JsonValue>();
    v->kind = JsonValue::kObject;
    expect('{');
    skip_ws();
    if (peek() == '}') {
      ++pos_;
      return v;
    }
    while (true) {
      skip_ws();
      JsonPtr key = parse_string();
      skip_ws();
      expect(':');
      JsonPtr val = parse_value();
      v->obj.emplace_back(std::move(key->str), std::move(val));
      skip_ws();
      if (peek() == ',') {
        ++pos_;
        continue;
      }
      expect('}');
      break;
    }
    return v;
  }

  JsonPtr parse_array() {
    auto v = std::make_unique<JsonValue>();
    v->kind = JsonValue::kArray;
    expect('[');
    skip_ws();
    if (peek() == ']') {
      ++pos_;
      return v;
    }
    while (true) {
      v->arr.push_back(parse_value());
      skip_ws();
      if (peek() == ',') {
        ++pos_;
        continue;
      }
      expect(']');
      break;
    }
    return v;
  }

  JsonPtr parse_string() {
    auto v = std::make_unique<JsonValue>();
    v->kind = JsonValue::kString;
    expect('"');
    while (true) {
      if (pos_ >= s_.size()) fail("unterminated string");
      char c = s_[pos_++];
      if (c == '"') break;
      if (c == '\\') {
        if (pos_ >= s_.size()) fail("bad escape");
        char e = s_[pos_++];
        switch (e) {
          case '"': v->str.push_back('"'); break;
          case '\\': v->str.push_back('\\'); break;
          case '/': v->str.push_back('/'); break;
          case 'b': v->str.push_back('\b'); break;
          case 'f': v->str.push_back('\f'); break;
          case 'n': v->str.push_back('\n'); break;
          case 'r': v->str.push_back('\r'); break;
          case 't': v->str.push_back('\t'); break;
          case 'u': {
            if (pos_ + 4 > s_.size()) fail("bad unicode escape");
            unsigned code = std::stoul(s_.substr(pos_, 4), nullptr, 16);
            pos_ += 4;
            // UTF-8 encode (BMP only — enough for numeric data files).
            if (code < 0x80) {
              v->str.push_back(static_cast<char>(code));
            } else if (code < 0x800) {
              v->str.push_back(static_cast<char>(0xC0 | (code >> 6)));
              v->str.push_back(static_cast<char>(0x80 | (code & 0x3F)));
            } else {
              v->str.push_back(static_cast<char>(0xE0 | (code >> 12)));
              v->str.push_back(static_cast<char>(0x80 | ((code >> 6) & 0x3F)));
              v->str.push_back(static_cast<char>(0x80 | (code & 0x3F)));
            }
            break;
          }
          default: fail("bad escape");
        }
      } else {
        v->str.push_back(c);
      }
    }
    return v;
  }

  JsonPtr parse_bool() {
    auto v = std::make_unique<JsonValue>();
    v->kind = JsonValue::kBool;
    if (s_.compare(pos_, 4, "true") == 0) {
      v->b = true;
      pos_ += 4;
    } else if (s_.compare(pos_, 5, "false") == 0) {
      v->b = false;
      pos_ += 5;
    } else {
      fail("bad literal");
    }
    return v;
  }

  JsonPtr parse_null() {
    auto v = std::make_unique<JsonValue>();
    if (s_.compare(pos_, 4, "null") != 0) fail("bad literal");
    pos_ += 4;
    return v;
  }

  JsonPtr parse_number() {
    auto v = std::make_unique<JsonValue>();
    v->kind = JsonValue::kNumber;
    size_t start = pos_;
    if (peek() == '-') ++pos_;
    while (pos_ < s_.size() &&
           (std::isdigit(static_cast<unsigned char>(s_[pos_])) || s_[pos_] == '.' ||
            s_[pos_] == 'e' || s_[pos_] == 'E' || s_[pos_] == '+' || s_[pos_] == '-'))
      ++pos_;
    v->num = std::strtod(s_.c_str() + start, nullptr);
    if (pos_ == start) fail("bad number");
    return v;
  }
};

std::string read_file(const char* path) {
  // Counterpart of ReadFile (utils.c:17-49).
  std::ifstream in(path, std::ios::binary);
  if (!in) throw std::runtime_error(std::string("cannot open ") + path);
  std::ostringstream os;
  os << in.rdbuf();
  return os.str();
}

// ---------------------------------------------------------------------------
// Decoders for the reference problem format (json_utils.h:24-66).
// ---------------------------------------------------------------------------

void fill_vector(const JsonValue* v, double* out, Py_ssize_t len, const char* name) {
  if (!v || v->kind != JsonValue::kArray || (Py_ssize_t)v->arr.size() != len)
    throw std::runtime_error(std::string("bad vector field ") + name);
  for (Py_ssize_t i = 0; i < len; ++i) out[i] = v->arr[i]->num;
}

// Column-major on disk (json_utils.c:87-126): outer list = columns.
void fill_matrix(const JsonValue* v, double* out, Py_ssize_t rows, Py_ssize_t cols,
                 const char* name) {
  if (!v || v->kind != JsonValue::kArray || (Py_ssize_t)v->arr.size() != cols)
    throw std::runtime_error(std::string("bad matrix field ") + name);
  for (Py_ssize_t c = 0; c < cols; ++c) {
    const JsonValue* col = v->arr[c].get();
    if (col->kind != JsonValue::kArray || (Py_ssize_t)col->arr.size() != rows)
      throw std::runtime_error(std::string("ragged matrix field ") + name);
    for (Py_ssize_t r = 0; r < rows; ++r) out[r * cols + c] = col->arr[r]->num;
  }
}

PyObject* make_f64_bytes(const std::vector<double>& data) {
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(data.data()),
                                   static_cast<Py_ssize_t>(data.size() * sizeof(double)));
}

// load_problem(path) -> dict of packed row-major float64 buffers + dims.
PyObject* load_problem(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  try {
    std::string text = read_file(path);
    Parser parser(text);
    JsonPtr root = parser.parse();
    const JsonValue* nh = root->find("nhorizon");
    const JsonValue* knots = root->find("lqrdata");
    const JsonValue* x0v = root->find("x0");
    if (!nh || !knots || !x0v) throw std::runtime_error("missing problem fields");
    Py_ssize_t N = static_cast<Py_ssize_t>(nh->num);
    if (N < 2 || knots->kind != JsonValue::kArray ||
        (Py_ssize_t)knots->arr.size() != N)
      throw std::runtime_error("bad nhorizon/lqrdata");
    const JsonValue* first = knots->arr[0].get();
    Py_ssize_t n = static_cast<Py_ssize_t>(first->find("nstates")->num);
    Py_ssize_t m = static_cast<Py_ssize_t>(first->find("ninputs")->num);

    std::vector<double> A(N * n * n), B(N * n * m), f(N * n), Q(N * n), R(N * m),
        q(N * n), r(N * m), c(N), x0(n);
    fill_vector(x0v, x0.data(), n, "x0");
    std::vector<bool> seen(N, false);
    for (Py_ssize_t i = 0; i < N; ++i) {
      const JsonValue* kd = knots->arr[i].get();
      // 1-based Julia index (json_utils.c:237).
      Py_ssize_t k = static_cast<Py_ssize_t>(kd->find("index")->num) - 1;
      if (k < 0 || k >= N || seen[k]) throw std::runtime_error("bad knot index");
      seen[k] = true;
      fill_matrix(kd->find("A"), A.data() + k * n * n, n, n, "A");
      fill_matrix(kd->find("B"), B.data() + k * n * m, n, m, "B");
      fill_vector(kd->find("d"), f.data() + k * n, n, "d");
      fill_vector(kd->find("Q"), Q.data() + k * n, n, "Q");
      fill_vector(kd->find("R"), R.data() + k * m, m, "R");
      fill_vector(kd->find("q"), q.data() + k * n, n, "q");
      fill_vector(kd->find("r"), r.data() + k * m, m, "r");
      const JsonValue* cv = kd->find("c");
      c[k] = cv ? cv->num : 0.0;
    }

    PyObject* out = PyDict_New();
    PyDict_SetItemString(out, "nhorizon", PyLong_FromSsize_t(N));
    PyDict_SetItemString(out, "nstates", PyLong_FromSsize_t(n));
    PyDict_SetItemString(out, "ninputs", PyLong_FromSsize_t(m));
    PyDict_SetItemString(out, "A", make_f64_bytes(A));
    PyDict_SetItemString(out, "B", make_f64_bytes(B));
    PyDict_SetItemString(out, "f", make_f64_bytes(f));
    PyDict_SetItemString(out, "Qdiag", make_f64_bytes(Q));
    PyDict_SetItemString(out, "Rdiag", make_f64_bytes(R));
    PyDict_SetItemString(out, "q", make_f64_bytes(q));
    PyDict_SetItemString(out, "r", make_f64_bytes(r));
    PyDict_SetItemString(out, "c", make_f64_bytes(c));
    PyDict_SetItemString(out, "x0", make_f64_bytes(x0));
    // Golden solution if present (test problems ship one).
    const JsonValue* soln = root->find("soln");
    if (soln && soln->kind == JsonValue::kArray) {
      std::vector<double> s;
      if (!soln->arr.empty() && soln->arr[0]->kind == JsonValue::kArray) {
        for (const auto& col : soln->arr)
          for (const auto& e : col->arr) s.push_back(e->num);
      } else {
        for (const auto& e : soln->arr) s.push_back(e->num);
      }
      PyDict_SetItemString(out, "soln", make_f64_bytes(s));
    }
    return out;
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_ValueError, e.what());
    return nullptr;
  }
}

// ---------------------------------------------------------------------------
// Tree index tables (closed-form, see rslqr_tpu/tree.py and
// binary_tree.c:65-106). Emitted as int32 buffers.
// ---------------------------------------------------------------------------

PyObject* tree_tables(PyObject*, PyObject* args) {
  Py_ssize_t N = 0;
  if (!PyArg_ParseTuple(args, "n", &N)) return nullptr;
  if (N < 2 || (N & (N - 1)) != 0) {
    PyErr_SetString(PyExc_ValueError, "nhorizon must be a power of two >= 2");
    return nullptr;
  }
  int depth = 0;
  while ((Py_ssize_t(1) << depth) < N) ++depth;

  std::vector<int32_t> levels(N - 1);
  for (Py_ssize_t k = 0; k < N - 1; ++k) {
    int32_t lvl = 0;
    Py_ssize_t v = k + 1;
    while ((v & 1) == 0) {
      ++lvl;
      v >>= 1;
    }
    levels[k] = lvl;
  }
  std::vector<int32_t> sep(N * depth);
  std::vector<uint8_t> calc(N * depth);
  for (int L = 0; L < depth; ++L) {
    for (Py_ssize_t k = 0; k < N; ++k) {
      Py_ssize_t kk = (k == N - 1) ? N - 2 : k;
      int32_t idx =
          static_cast<int32_t>(((kk >> (L + 1)) << (L + 1)) + (Py_ssize_t(1) << L) - 1);
      sep[k * depth + L] = idx;
      Py_ssize_t left_start = idx - (Py_ssize_t(1) << L) + 1;
      Py_ssize_t right_start = idx + 1;
      bool is_start = (k == left_start) || (k == right_start);
      calc[k * depth + L] = (!is_start || k == 0) ? 1 : 0;
    }
  }

  PyObject* out = PyDict_New();
  PyDict_SetItemString(out, "depth", PyLong_FromLong(depth));
  PyDict_SetItemString(
      out, "levels",
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(levels.data()),
                                static_cast<Py_ssize_t>(levels.size() * 4)));
  PyDict_SetItemString(
      out, "sep_index",
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(sep.data()),
                                static_cast<Py_ssize_t>(sep.size() * 4)));
  PyDict_SetItemString(
      out, "calc_lambda",
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(calc.data()),
                                static_cast<Py_ssize_t>(calc.size())));
  return out;
}

PyMethodDef kMethods[] = {
    {"load_problem", load_problem, METH_VARARGS,
     "Parse a reference-format LQR problem JSON file into packed buffers."},
    {"tree_tables", tree_tables, METH_VARARGS,
     "Closed-form nested-dissection index tables for a power-of-two horizon."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_rslqr_native",
    "Native host runtime for rslqr_tpu (JSON loader + tree tables).", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__rslqr_native(void) { return PyModule_Create(&kModule); }
