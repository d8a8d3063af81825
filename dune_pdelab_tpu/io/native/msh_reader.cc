// Native Gmsh MSH 2.x ASCII parser (the grid-input hot path for large
// unstructured meshes; reference analog: dune-grid's GmshReader, which the
// reference's test grids dune/pdelab/test/grids/*.msh are read through).
//
// Two-call C API used from ctypes (dune_pdelab_tpu/io/msh_native.py):
//   msh_open  — parse the file, report entity counts
//   msh_fill  — copy the parsed arrays into caller-allocated buffers
//   msh_close — free the parse state
// Node ids are remapped to file row order exactly like the pure-Python
// parser (mesh/simplex.py from_gmsh), so both paths produce identical
// arrays. Unknown element types with known node counts are skipped; an
// unknown type aborts with an error code (the Python fallback then runs).
//
// Build: g++ -O3 -shared -fPIC -o libmshreader.so msh_reader.cc
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <unordered_map>

namespace {

struct MshData {
  std::vector<double> coords;                       // nn * 3
  std::vector<int64_t> tris, tritags;               // nt * 3, nt
  std::vector<int64_t> tets, tettags;               // nq * 4, nq
  std::vector<int64_t> lns, lntags;                 // nl * 2, nl
};

bool seek_section(FILE* f, const char* name) {
  char buf[512];
  while (fgets(buf, sizeof buf, f)) {
    std::string s(buf);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r' ||
                          s.back() == ' ' || s.back() == '\t'))
      s.pop_back();
    if (s == name) return true;
  }
  return false;
}

// nodes per element for gmsh types we can skip over silently
int skip_count(int64_t etype) {
  switch (etype) {
    case 15: return 1;   // point
    case 3:  return 4;   // quad
    case 5:  return 8;   // hex
    case 6:  return 6;   // prism
    case 7:  return 5;   // pyramid
    case 8:  return 3;   // line3
    case 9:  return 6;   // tri6
    case 10: return 9;   // quad9
    case 11: return 10;  // tet10
    default: return -1;
  }
}

}  // namespace

extern "C" {

void* msh_open(const char* path, int64_t* nnodes, int64_t* ntris,
               int64_t* ntets, int64_t* nlines, int* err) {
  *err = 0;
  *nnodes = *ntris = *ntets = *nlines = 0;
  FILE* f = fopen(path, "r");
  if (!f) { *err = 1; return nullptr; }
  MshData* d = nullptr;
  auto fail = [&](int code) -> void* {
    fclose(f);
    delete d;
    *err = code;
    return nullptr;
  };
  if (!seek_section(f, "$MeshFormat")) return fail(2);
  double ver;
  if (fscanf(f, "%lf", &ver) != 1 || ver < 2.0 || ver >= 3.0) return fail(3);
  if (!seek_section(f, "$Nodes")) return fail(4);
  long long nn;
  if (fscanf(f, "%lld", &nn) != 1 || nn < 0) return fail(5);
  d = new MshData();
  d->coords.resize(static_cast<size_t>(nn) * 3);
  std::unordered_map<int64_t, int64_t> idmap;
  idmap.reserve(static_cast<size_t>(nn) * 2);
  for (long long r = 0; r < nn; ++r) {
    long long id;
    double x, y, z;
    if (fscanf(f, "%lld %lf %lf %lf", &id, &x, &y, &z) != 4) return fail(6);
    idmap[id] = r;
    d->coords[3 * r + 0] = x;
    d->coords[3 * r + 1] = y;
    d->coords[3 * r + 2] = z;
  }
  if (!seek_section(f, "$Elements")) return fail(7);
  long long ne;
  if (fscanf(f, "%lld", &ne) != 1 || ne < 0) return fail(8);
  for (long long r = 0; r < ne; ++r) {
    long long id, etype, ntags;
    if (fscanf(f, "%lld %lld %lld", &id, &etype, &ntags) != 3) return fail(9);
    long long tag = 0, t;
    for (long long k = 0; k < ntags; ++k) {
      if (fscanf(f, "%lld", &t) != 1) return fail(9);
      if (k == 0) tag = t;
    }
    int nv = etype == 1 ? 2 : etype == 2 ? 3 : etype == 4 ? 4 : -1;
    if (nv < 0) {
      int skip = skip_count(etype);
      if (skip < 0) return fail(10);
      for (int k = 0; k < skip; ++k)
        if (fscanf(f, "%lld", &t) != 1) return fail(9);
      continue;
    }
    long long v[4];
    for (int k = 0; k < nv; ++k)
      if (fscanf(f, "%lld", &v[k]) != 1) return fail(11);
    std::vector<int64_t>* arr;
    std::vector<int64_t>* tg;
    if (etype == 1) { arr = &d->lns; tg = &d->lntags; }
    else if (etype == 2) { arr = &d->tris; tg = &d->tritags; }
    else { arr = &d->tets; tg = &d->tettags; }
    for (int k = 0; k < nv; ++k) {
      auto it = idmap.find(v[k]);
      if (it == idmap.end()) return fail(12);
      arr->push_back(it->second);
    }
    tg->push_back(tag);
  }
  fclose(f);
  *nnodes = nn;
  *ntris = static_cast<int64_t>(d->tris.size() / 3);
  *ntets = static_cast<int64_t>(d->tets.size() / 4);
  *nlines = static_cast<int64_t>(d->lns.size() / 2);
  return d;
}

void msh_fill(void* h, double* coords, int64_t* tris, int64_t* tritags,
              int64_t* tets, int64_t* tettags, int64_t* lns,
              int64_t* lntags) {
  auto* d = static_cast<MshData*>(h);
  auto cp = [](auto* dst, const auto& src) {
    if (!src.empty())
      std::memcpy(dst, src.data(), src.size() * sizeof(src[0]));
  };
  cp(coords, d->coords);
  cp(tris, d->tris);
  cp(tritags, d->tritags);
  cp(tets, d->tets);
  cp(tettags, d->tettags);
  cp(lns, d->lns);
  cp(lntags, d->lntags);
}

void msh_close(void* h) { delete static_cast<MshData*>(h); }

}  // extern "C"
