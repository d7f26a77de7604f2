// Native hierarchy-corpus loader for lexls_tpu.
//
// Parses the text ".dat" hierarchy format of the reference corpus
// (format spec: reference include/lexls/tools.h:263-270 header tags,
// :29-40 hierarchy/objective kind codes, :188-241 per-row layout) and
// exposes the result through a flat C ABI consumed via ctypes from
// lexls_tpu.io.native.  This is the framework's data-loading runtime:
// a single pass, zero-copy-out parse designed to feed large problem
// corpora to the device pipeline without Python string overhead.
//
// This is an original implementation written against the format, not a
// translation of the reference parser: it tokenizes the whole buffer in
// one scan and builds contiguous row-major arrays directly.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kHierEqualities = 100;
constexpr int kHierInequalities = 200;
constexpr int kHierInequalitiesAS = 210;
constexpr int kObjSimple = 100;
constexpr int kObjGeneral = 200;

struct Objective {
    std::vector<double> data;     // row-major, rows x cols
    std::vector<int32_t> as_guess;  // empty unless HierType 210
    int rows = 0;
    int cols = 0;
};

struct Hierarchy {
    int hier_type = 0;
    int n_var = 0;
    int n_obj = 0;
    std::vector<int32_t> n_ctr;
    std::vector<int32_t> obj_type;
    std::vector<Objective> objectives;
    std::vector<double> sol_guess;  // empty or n_var
    std::vector<double> solution;   // empty or n_var
    std::string error;
};

class Scanner {
  public:
    Scanner(const char* buf, size_t len) : p_(buf), end_(buf + len) {}

    // Advance to the next non-space character; returns false at EOF.
    bool skipSpace() {
        while (p_ < end_ && std::isspace(static_cast<unsigned char>(*p_))) ++p_;
        return p_ < end_;
    }

    // A "word" is a maximal run of non-space characters.
    bool nextWord(std::string& out) {
        if (!skipSpace()) return false;
        const char* s = p_;
        while (p_ < end_ && !std::isspace(static_cast<unsigned char>(*p_))) ++p_;
        out.assign(s, p_ - s);
        return true;
    }

    bool peekWord(std::string& out) {
        const char* save = p_;
        bool ok = nextWord(out);
        p_ = save;
        return ok;
    }

    bool nextInt(long& out) {
        if (!skipSpace()) return false;
        char* endp = nullptr;
        out = std::strtol(p_, &endp, 10);
        if (endp == p_) return false;
        p_ = endp;
        return true;
    }

    bool nextDouble(double& out) {
        if (!skipSpace()) return false;
        char* endp = nullptr;
        out = std::strtod(p_, &endp);
        if (endp == p_) return false;
        p_ = endp;
        return true;
    }

    // Ints remaining on the current line (used for #nCtr / #ObjType rows).
    void lineInts(std::vector<int32_t>& out) {
        while (p_ < end_ && *p_ != '\n') {
            while (p_ < end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\r')) ++p_;
            if (p_ >= end_ || *p_ == '\n') break;
            char* endp = nullptr;
            long v = std::strtol(p_, &endp, 10);
            if (endp == p_) break;
            out.push_back(static_cast<int32_t>(v));
            p_ = endp;
        }
    }

    void skipLine() {
        while (p_ < end_ && *p_ != '\n') ++p_;
        if (p_ < end_) ++p_;
    }

    bool atLineEnd() {
        const char* q = p_;
        while (q < end_ && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
        return q >= end_ || *q == '\n';
    }

  private:
    const char* p_;
    const char* end_;
};

bool parseBuffer(const char* buf, size_t len, Hierarchy& h) {
    Scanner sc(buf, len);
    std::string word;

    bool have_var = false, have_obj = false, have_ctr = false, have_type = false,
         have_objtype = false;

    // --- header (tags may appear in any order; '#'-lines that are not
    // tags, like the export timestamp comment, are skipped)
    while (sc.peekWord(word)) {
        if (word == "#nVar") {
            sc.nextWord(word);
            long v;
            if (!sc.nextInt(v)) { h.error = "bad #nVar"; return false; }
            h.n_var = static_cast<int>(v);
            have_var = true;
        } else if (word == "#nObj") {
            sc.nextWord(word);
            long v;
            if (!sc.nextInt(v)) { h.error = "bad #nObj"; return false; }
            h.n_obj = static_cast<int>(v);
            have_obj = true;
        } else if (word == "#HierType") {
            sc.nextWord(word);
            long v;
            if (!sc.nextInt(v)) { h.error = "bad #HierType"; return false; }
            if (v != kHierEqualities && v != kHierInequalities && v != kHierInequalitiesAS) {
                h.error = "unsupported hierarchy type";
                return false;
            }
            h.hier_type = static_cast<int>(v);
            have_type = true;
        } else if (word == "#nCtr") {
            sc.nextWord(word);
            sc.skipSpace();
            sc.lineInts(h.n_ctr);
            have_ctr = true;
        } else if (word == "#ObjType") {
            sc.nextWord(word);
            sc.skipSpace();
            sc.lineInts(h.obj_type);
            have_objtype = true;
        } else if (word == "#OBJECTIVE") {
            break;  // header done
        } else {
            sc.skipLine();  // comment or unknown line
        }
        if (have_var && have_obj && have_ctr && have_type && have_objtype) break;
    }

    if (!(have_var && have_obj && have_ctr && have_type && have_objtype)) {
        h.error = "missing required header field";
        return false;
    }
    if (static_cast<int>(h.n_ctr.size()) != h.n_obj
        || static_cast<int>(h.obj_type.size()) != h.n_obj) {
        h.error = "wrong number of objectives in #nCtr/#ObjType";
        return false;
    }
    for (int32_t t : h.obj_type) {
        if (t != kObjSimple && t != kObjGeneral) {
            h.error = "unsupported objective type";
            return false;
        }
    }

    const int n_bounds = (h.hier_type == kHierEqualities) ? 1 : 2;
    const bool with_as = (h.hier_type == kHierInequalitiesAS);

    // --- objective blocks, ascending order
    h.objectives.resize(h.n_obj);
    int obj_index = 0;
    while (obj_index < h.n_obj && sc.nextWord(word)) {
        if (word.rfind("#OBJECTIVE", 0) != 0) continue;
        long idx;
        if (!sc.nextInt(idx)) { h.error = "bad #OBJECTIVE index"; return false; }

        Objective& o = h.objectives[obj_index];
        if (h.obj_type[obj_index] == kObjSimple) {
            if (obj_index != 0) {
                h.error = "simple constraints are supported only in the first objective";
                return false;
            }
            o.cols = 1 + n_bounds;
        } else {
            o.cols = h.n_var + n_bounds;
        }
        o.rows = h.n_ctr[obj_index];
        o.data.resize(static_cast<size_t>(o.rows) * o.cols);
        if (with_as) o.as_guess.assign(o.rows, 0);

        for (int r = 0; r < o.rows; ++r) {
            for (int c = 0; c < o.cols; ++c) {
                if (!sc.nextDouble(o.data[static_cast<size_t>(r) * o.cols + c])) {
                    h.error = "not enough data in objective block";
                    return false;
                }
            }
            if (with_as) {
                // optional trailing activation type on the same line
                if (!sc.atLineEnd()) {
                    long t;
                    if (sc.nextInt(t)) {
                        if (t < 0 || t > 3) {
                            h.error = "unsupported constraint activation type";
                            return false;
                        }
                        o.as_guess[r] = static_cast<int32_t>(t);
                    }
                }
            }
        }
        ++obj_index;
    }
    if (obj_index != h.n_obj) {
        h.error = "fewer objectives than declared";
        return false;
    }

    // --- optional footer vectors
    while (sc.nextWord(word)) {
        std::vector<double>* target = nullptr;
        if (word == "#SolGuess") target = &h.sol_guess;
        else if (word == "#Solution") target = &h.solution;
        else continue;
        target->resize(h.n_var);
        for (int i = 0; i < h.n_var; ++i) {
            if (!sc.nextDouble((*target)[i])) {
                h.error = "could not read a solution vector";
                return false;
            }
        }
    }
    return true;
}

}  // namespace

extern "C" {

// Parse a .dat file; returns an opaque handle (nullptr on error, with a
// message in err).
void* lexls_io_parse_file(const char* path, char* err, int err_len) {
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        std::snprintf(err, err_len, "cannot open file for reading: %s", path);
        return nullptr;
    }
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(static_cast<size_t>(size));
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    std::fclose(f);

    auto* h = new Hierarchy();
    if (!parseBuffer(buf.data(), got, *h)) {
        std::snprintf(err, err_len, "%s", h->error.c_str());
        delete h;
        return nullptr;
    }
    return h;
}

void* lexls_io_parse_string(const char* buf, long len, char* err, int err_len) {
    auto* h = new Hierarchy();
    if (!parseBuffer(buf, static_cast<size_t>(len), *h)) {
        std::snprintf(err, err_len, "%s", h->error.c_str());
        delete h;
        return nullptr;
    }
    return h;
}

void lexls_io_free(void* handle) { delete static_cast<Hierarchy*>(handle); }

int lexls_io_hier_type(void* handle) { return static_cast<Hierarchy*>(handle)->hier_type; }
int lexls_io_n_var(void* handle) { return static_cast<Hierarchy*>(handle)->n_var; }
int lexls_io_n_obj(void* handle) { return static_cast<Hierarchy*>(handle)->n_obj; }

const int32_t* lexls_io_n_ctr(void* handle) {
    return static_cast<Hierarchy*>(handle)->n_ctr.data();
}
const int32_t* lexls_io_obj_type(void* handle) {
    return static_cast<Hierarchy*>(handle)->obj_type.data();
}
int lexls_io_obj_rows(void* handle, int i) {
    return static_cast<Hierarchy*>(handle)->objectives[i].rows;
}
int lexls_io_obj_cols(void* handle, int i) {
    return static_cast<Hierarchy*>(handle)->objectives[i].cols;
}
const double* lexls_io_obj_data(void* handle, int i) {
    return static_cast<Hierarchy*>(handle)->objectives[i].data.data();
}
const int32_t* lexls_io_obj_as_guess(void* handle, int i) {
    Objective& o = static_cast<Hierarchy*>(handle)->objectives[i];
    return o.as_guess.empty() ? nullptr : o.as_guess.data();
}
int lexls_io_has_sol_guess(void* handle) {
    return static_cast<Hierarchy*>(handle)->sol_guess.empty() ? 0 : 1;
}
int lexls_io_has_solution(void* handle) {
    return static_cast<Hierarchy*>(handle)->solution.empty() ? 0 : 1;
}
const double* lexls_io_sol_guess(void* handle) {
    return static_cast<Hierarchy*>(handle)->sol_guess.data();
}
const double* lexls_io_solution(void* handle) {
    return static_cast<Hierarchy*>(handle)->solution.data();
}

}  // extern "C"
