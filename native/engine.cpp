// auvtpu native CPU engine: exact reference-semantics batch interpolation.
//
// This is the C++ twin of auvtpu/golden/engine.py — the float64 oracle with
// the observable behavior of the reference CPU engine (src/GridH.cpp of
// devsaxena974/AUV-Real-Time-Interpolation), written from scratch against the
// documented semantics:
//   * strict bounds test -> NaN (GridH.cpp:162-164)
//   * bilinear with valid-corner-mean fallback (GridH.cpp:160-210)
//   * floor-anchored clamped 4x4 Catmull-Rom; any-NaN -> ring fallback
//     (GridH.cpp:223-319)
//   * Chebyshev-ring candidate collection with per-segment early stop at >= 4
//     (GridH.cpp:24-118), distances to cell centers (i+0.5, j+0.5)
//   * 4-pass selection sort WITH swaps (GridH.cpp:123-140) — the swaps affect
//     which equal-distance candidate survives, so they are reproduced
//   * ordinary kriging: round-half-away center, exponential variogram
//     (nugget 1, sill 100, range 10 in degrees), neighbors at cell centers,
//     query at raw coords, unpivoted Gauss-Jordan with 1e-12 singular bailout
//     (GridH.cpp:326-420)
//
// Exposed as a C ABI for ctypes.  Multi-threaded over query points.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxRadius = 10;
constexpr int kWindow = 2 * kMaxRadius + 1;
constexpr int kMaxCand = kWindow * kWindow;

struct GridView {
  const double* elev;  // row-major [num_lat][num_lon]
  int num_lat, num_lon;
  double min_lon, max_lon, min_lat, max_lat;
  double lon_step, lat_step;
};

inline bool oob(const GridView& g, double lon, double lat) {
  return lon < g.min_lon || lon > g.max_lon || lat < g.min_lat || lat > g.max_lat;
}

inline double cell(const GridView& g, int j, int i) {
  return g.elev[static_cast<int64_t>(j) * g.num_lon + i];
}

struct Candidates {
  int i[kMaxCand];
  int j[kMaxCand];
  double val[kMaxCand];
  double dist[kMaxCand];
  int count = 0;

  void add(const GridView& g, int ii, int jj, double x, double y) {
    double v = cell(g, jj, ii);
    if (std::isnan(v)) return;
    i[count] = ii;
    j[count] = jj;
    val[count] = v;
    double di = (ii + 0.5) - x;
    double dj = (jj + 0.5) - y;
    dist[count] = std::sqrt(di * di + dj * dj);
    ++count;
  }
};

// Ring collection: center, then per ring r the top/bottom edges (interleaved
// per dx) with a >=4 stop check at segment end, then left/right edges with a
// second check.
int collect(const GridView& g, double x, double y, int ci, int cj, Candidates& c) {
  if (ci >= 0 && ci < g.num_lon && cj >= 0 && cj < g.num_lat) c.add(g, ci, cj, x, y);
  for (int r = 1; r <= kMaxRadius && c.count < kMaxCand; ++r) {
    int top = cj - r, bottom = cj + r;
    for (int dx = -r; dx <= r && c.count < kMaxCand; ++dx) {
      int ix = ci + dx;
      if (ix < 0 || ix >= g.num_lon) continue;
      if (top >= 0) c.add(g, ix, top, x, y);
      if (bottom < g.num_lat) c.add(g, ix, bottom, x, y);
    }
    if (c.count >= 4) break;
    int left = ci - r, right = ci + r;
    for (int dy = -r + 1; dy <= r - 1 && c.count < kMaxCand; ++dy) {
      int jy = cj + dy;
      if (jy < 0 || jy >= g.num_lat) continue;
      if (left >= 0) c.add(g, left, jy, x, y);
      if (right < g.num_lon) c.add(g, right, jy, x, y);
    }
    if (c.count >= 4) break;
  }
  return c.count;
}

// 4-pass selection sort with swaps (strict < keeps the earliest minimum).
void select4(Candidates& c) {
  int n = c.count;
  for (int m = 0; m < 4; ++m) {
    int best = m;
    for (int k = m + 1; k < n; ++k)
      if (c.dist[k] < c.dist[best]) best = k;
    std::swap(c.dist[m], c.dist[best]);
    std::swap(c.i[m], c.i[best]);
    std::swap(c.j[m], c.j[best]);
    std::swap(c.val[m], c.val[best]);
  }
}

double mean_of(const double* v, int n) {
  if (n <= 0) return std::numeric_limits<double>::quiet_NaN();
  double s = 0.0;
  for (int k = 0; k < n; ++k) s += v[k];
  return s / n;
}

double bilinear_one(const GridView& g, double lon, double lat) {
  if (oob(g, lon, lat)) return std::numeric_limits<double>::quiet_NaN();
  double x = (lon - g.min_lon) / g.lon_step;
  double y = (lat - g.min_lat) / g.lat_step;
  int x0 = static_cast<int>(std::floor(x));
  int y0 = static_cast<int>(std::floor(y));
  int x1 = std::min(x0 + 1, g.num_lon - 1);
  int y1 = std::min(y0 + 1, g.num_lat - 1);
  double wx = x - x0, wy = y - y0;
  double z00 = cell(g, y0, x0), z01 = cell(g, y0, x1);
  double z10 = cell(g, y1, x0), z11 = cell(g, y1, x1);
  if (std::isnan(z00) || std::isnan(z01) || std::isnan(z10) || std::isnan(z11)) {
    double s = 0.0;
    int n = 0;
    for (double z : {z00, z01, z10, z11})
      if (!std::isnan(z)) { s += z; ++n; }
    return n ? s / n : std::numeric_limits<double>::quiet_NaN();
  }
  double a = (1 - wx) * z00 + wx * z01;
  double b = (1 - wx) * z10 + wx * z11;
  return (1 - wy) * a + wy * b;
}

inline double catmull(double p0, double p1, double p2, double p3, double t) {
  return 0.5 * (2 * p1 + (-p0 + p2) * t + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t * t +
                (-p0 + 3 * p1 - 3 * p2 + p3) * t * t * t);
}

double cubic_one(const GridView& g, double lon, double lat) {
  if (oob(g, lon, lat)) return std::numeric_limits<double>::quiet_NaN();
  double x = (lon - g.min_lon) / g.lon_step;
  double y = (lat - g.min_lat) / g.lat_step;
  int xi = static_cast<int>(std::floor(x));
  int yi = static_cast<int>(std::floor(y));
  double tx = x - xi, ty = y - yi;

  bool has_nan = false;
  double patch[4][4];
  for (int m = -1; m <= 2; ++m) {
    int jj = std::clamp(yi + m, 0, g.num_lat - 1);
    for (int n = -1; n <= 2; ++n) {
      int ii = std::clamp(xi + n, 0, g.num_lon - 1);
      double v = cell(g, jj, ii);
      patch[m + 1][n + 1] = v;
      has_nan |= std::isnan(v);
    }
  }
  if (!has_nan) {
    double col[4];
    for (int m = 0; m < 4; ++m)
      col[m] = catmull(patch[m][0], patch[m][1], patch[m][2], patch[m][3], tx);
    return catmull(col[0], col[1], col[2], col[3], ty);
  }
  Candidates c;
  int found = collect(g, x, y, xi, yi, c);
  if (found < 4) return mean_of(c.val, found);
  select4(c);
  return mean_of(c.val, 4);
}

double variogram(double h) { return 1.0 + 100.0 * (1.0 - std::exp(-h / 10.0)); }

double kriging_one(const GridView& g, double lon, double lat) {
  if (oob(g, lon, lat)) return std::numeric_limits<double>::quiet_NaN();
  double x = (lon - g.min_lon) / g.lon_step;
  double y = (lat - g.min_lat) / g.lat_step;
  int ci = std::clamp(static_cast<int>(std::floor(x + 0.5)), 0, g.num_lon - 1);
  int cj = std::clamp(static_cast<int>(std::floor(y + 0.5)), 0, g.num_lat - 1);

  Candidates c;
  int found = collect(g, x, y, ci, cj, c);
  if (found < 4) return mean_of(c.val, found);
  select4(c);

  double cx[4], cy[4];
  for (int k = 0; k < 4; ++k) {
    cx[k] = g.min_lon + (c.i[k] + 0.5) * g.lon_step;
    cy[k] = g.min_lat + (c.j[k] + 0.5) * g.lat_step;
  }
  double M[5][6] = {};
  for (int a = 0; a < 4; ++a) {
    for (int b = 0; b < 4; ++b) {
      double dx = cx[a] - cx[b], dy = cy[a] - cy[b];
      M[a][b] = variogram(std::sqrt(dx * dx + dy * dy));
    }
    M[a][4] = 1.0;
  }
  for (int b = 0; b < 4; ++b) M[4][b] = 1.0;
  M[4][4] = 0.0;
  for (int a = 0; a < 4; ++a) {
    double dx = cx[a] - lon, dy = cy[a] - lat;
    M[a][5] = variogram(std::sqrt(dx * dx + dy * dy));
  }
  M[4][5] = 1.0;

  for (int p = 0; p < 5; ++p) {
    double piv = M[p][p];
    if (std::fabs(piv) < 1e-12) return mean_of(c.val, 4);
    for (int q = p; q < 6; ++q) M[p][q] /= piv;
    for (int r = 0; r < 5; ++r) {
      if (r == p) continue;
      double f = M[r][p];
      for (int q = p; q < 6; ++q) M[r][q] -= f * M[p][q];
    }
  }
  double pred = 0.0;
  for (int a = 0; a < 4; ++a) pred += M[a][5] * c.val[a];
  return pred;
}

template <double (*Fn)(const GridView&, double, double)>
void run_batch(const GridView& g, const double* lons, const double* lats,
               double* out, int64_t n, int n_threads) {
  if (n_threads <= 1) {
    for (int64_t q = 0; q < n; ++q) out[q] = Fn(g, lons[q], lats[q]);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t s = t * per, e = std::min(n, s + per);
    if (s >= e) break;
    ts.emplace_back([&, s, e] {
      for (int64_t q = s; q < e; ++q) out[q] = Fn(g, lons[q], lats[q]);
    });
  }
  for (auto& t : ts) t.join();
}

GridView make_view(const double* elev, int num_lat, int num_lon, double min_lon,
                   double max_lon, double min_lat, double max_lat) {
  GridView g;
  g.elev = elev;
  g.num_lat = num_lat;
  g.num_lon = num_lon;
  g.min_lon = min_lon;
  g.max_lon = max_lon;
  g.min_lat = min_lat;
  g.max_lat = max_lat;
  g.lon_step = (max_lon - min_lon) / (num_lon - 1);
  g.lat_step = (max_lat - min_lat) / (num_lat - 1);
  return g;
}

int threads_for(int64_t n) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw <= 1 || n < 4096) return 1;
  return static_cast<int>(std::min<int64_t>(hw, n / 2048));
}

}  // namespace

extern "C" {

void auv_bilinear(const double* elev, int num_lat, int num_lon, double min_lon,
                  double max_lon, double min_lat, double max_lat,
                  const double* lons, const double* lats, double* out, int64_t n) {
  GridView g = make_view(elev, num_lat, num_lon, min_lon, max_lon, min_lat, max_lat);
  run_batch<bilinear_one>(g, lons, lats, out, n, threads_for(n));
}

void auv_cubic(const double* elev, int num_lat, int num_lon, double min_lon,
               double max_lon, double min_lat, double max_lat,
               const double* lons, const double* lats, double* out, int64_t n) {
  GridView g = make_view(elev, num_lat, num_lon, min_lon, max_lon, min_lat, max_lat);
  run_batch<cubic_one>(g, lons, lats, out, n, threads_for(n));
}

void auv_kriging(const double* elev, int num_lat, int num_lon, double min_lon,
                 double max_lon, double min_lat, double max_lat,
                 const double* lons, const double* lats, double* out, int64_t n) {
  GridView g = make_view(elev, num_lat, num_lon, min_lon, max_lon, min_lat, max_lat);
  run_batch<kriging_one>(g, lons, lats, out, n, threads_for(n));
}

}  // extern "C"
