// Native URDF parser + kinematic-topology preprocessor.
//
// The reference delegates model building to Pinocchio's C++ URDF pipeline
// (tests/loik-loid.cpp:111 `pinocchio::urdf::buildModel`).  This is the
// rebuild's native equivalent: a dependency-free C++17 parser that turns a
// URDF document into the flat arrays KinematicTree consumes (parents, joint
// types, axes, origins, velocity limits), with fixed-joint merging and
// topological ordering done natively.  Exposed C ABI, consumed from Python
// via ctypes (loik_tpu/model/native.py) — no pybind11 required.
//
// Scope: the SAME URDF subset as the Python parser (revolute / continuous /
// prismatic / floating / planar / fixed, plus the spherical / translation /
// universal / helical / spherical_zyx extensions; origins, axes + axis2,
// helical <pitch value=>, velocity limits), including the mimic policy:
// <mimic> rejects by default, and mimic_reduce folds serial-adjacent pairs
// into one MIMIC_PAIR joint exactly like load_urdf(mimic='reduce').
// Composite joints are make_tree-level sugar with no URDF representation —
// neither parser loads them.  Both parsers are cross-tested against each
// other in tests/test_native.py.

#include <cctype>
#include <cmath>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

struct Mat3 {
  double m[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
};

Mat3 matmul(const Mat3& a, const Mat3& b) {
  Mat3 r;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += a.m[3 * i + k] * b.m[3 * k + j];
      r.m[3 * i + j] = s;
    }
  return r;
}

Vec3 matvec(const Mat3& a, const Vec3& v) {
  return {a.m[0] * v.x + a.m[1] * v.y + a.m[2] * v.z,
          a.m[3] * v.x + a.m[4] * v.y + a.m[5] * v.z,
          a.m[6] * v.x + a.m[7] * v.y + a.m[8] * v.z};
}

// URDF rpy: R = Rz(yaw) Ry(pitch) Rx(roll)
Mat3 rpy_to_mat(double r, double p, double y) {
  double cr = std::cos(r), sr = std::sin(r);
  double cp = std::cos(p), sp = std::sin(p);
  double cy = std::cos(y), sy = std::sin(y);
  Mat3 R;
  R.m[0] = cy * cp;
  R.m[1] = cy * sp * sr - sy * cr;
  R.m[2] = cy * sp * cr + sy * sr;
  R.m[3] = sy * cp;
  R.m[4] = sy * sp * sr + cy * cr;
  R.m[5] = sy * sp * cr - cy * sr;
  R.m[6] = -sp;
  R.m[7] = cp * sr;
  R.m[8] = cp * cr;
  return R;
}

// ---------------------------------------------------------------------------
// minimal XML scanner (elements + attributes; enough for URDF)
// ---------------------------------------------------------------------------

struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<XmlNode> children;
};

struct XmlParser {
  const char* p;
  const char* end;
  bool ok = true;

  explicit XmlParser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  void skip_ws() {
    while (p < end && std::isspace(static_cast<unsigned char>(*p))) p++;
  }

  void skip_misc() {
    // skip text, comments, PIs, doctype between elements
    for (;;) {
      skip_ws();
      if (p + 3 < end && p[0] == '<' && p[1] == '!' && p[2] == '-' && p[3] == '-') {
        const char* c = std::strstr(p + 4, "-->");
        if (!c) { ok = false; return; }
        p = c + 3;
      } else if (p < end && p[0] == '<' && (p + 1 < end) && (p[1] == '?' || p[1] == '!')) {
        while (p < end && *p != '>') p++;
        if (p < end) p++;
      } else if (p < end && *p != '<') {
        while (p < end && *p != '<') p++;
      } else {
        return;
      }
    }
  }

  std::string read_name() {
    std::string out;
    while (p < end && (std::isalnum(static_cast<unsigned char>(*p)) || *p == '_' ||
                       *p == '-' || *p == ':' || *p == '.'))
      out.push_back(*p++);
    return out;
  }

  bool parse_element(XmlNode& node) {
    skip_misc();
    if (p >= end || *p != '<') return false;
    p++;  // '<'
    node.tag = read_name();
    if (node.tag.empty()) { ok = false; return false; }
    // attributes
    for (;;) {
      skip_ws();
      if (p < end && *p == '/') {
        p++;
        if (p < end && *p == '>') { p++; return true; }  // self-closing
        ok = false; return false;
      }
      if (p < end && *p == '>') { p++; break; }
      std::string key = read_name();
      skip_ws();
      if (p >= end || *p != '=') { ok = false; return false; }
      p++;
      skip_ws();
      if (p >= end || (*p != '"' && *p != '\'')) { ok = false; return false; }
      char quote = *p++;
      std::string val;
      while (p < end && *p != quote) val.push_back(*p++);
      if (p < end) p++;
      node.attrs[key] = val;
    }
    // children until close tag
    for (;;) {
      skip_misc();
      if (p + 1 < end && p[0] == '<' && p[1] == '/') {
        p += 2;
        read_name();
        skip_ws();
        if (p < end && *p == '>') p++;
        return true;
      }
      XmlNode child;
      if (!parse_element(child)) { return ok; }
      node.children.push_back(std::move(child));
    }
  }
};

void parse_doubles(const std::string& s, double* out, int n) {
  const char* c = s.c_str();
  for (int i = 0; i < n; i++) {
    char* next = nullptr;
    out[i] = std::strtod(c, &next);
    c = next;
  }
}

// ---------------------------------------------------------------------------
// URDF -> flat arrays
// ---------------------------------------------------------------------------

struct JointOut {
  int parent;        // moving-joint parent index, -1 = world
  int jtype;         // 0 rev, 1 prism, 2 free-flyer, 3 spherical,
                     // 4 unbounded-rev, 5 translation, 6 planar, 7 universal,
                     // 8 helical, 9 spherical-ZYX, 10 mimic-pair
                     // (codes match loik_tpu/model/tree.py)
  Mat3 R;            // accumulated placement rotation
  Vec3 p;            // accumulated placement translation
  Vec3 axis;
  Vec3 axis2;        // universal second axis / mimic-pair inner axis
  double vel_limit;
  double pitch = 0;  // helical translation per radian
  // mimic-pair metadata (jtype 10): member type codes + coupling, inner
  // placement between master and mimic
  int pair_master_t = -1, pair_mimic_t = -1;
  double pair_mult = 1, pair_off = 0;
  Mat3 R2;
  Vec3 p2;
  std::string name;
};

struct ParseResult {
  std::vector<JointOut> joints;
  std::string names;  // '\n'-joined
  std::string error;
};

ParseResult parse_urdf(const std::string& xml, int floating_base,
                       int mimic_reduce) {
  ParseResult res;
  XmlParser parser(xml);
  XmlNode root;
  if (!parser.parse_element(root) || root.tag != "robot") {
    res.error = "failed to parse <robot> root element";
    return res;
  }

  struct JDef {
    std::string name, type, parent_link, child_link;
    Mat3 R;
    Vec3 p;
    Vec3 axis{0, 0, 1};
    Vec3 axis2{0, 1, 0};
    double vel_limit = 1e30;
    double pitch = 0;
    bool has_mimic = false;
    std::string mimic_joint;
    double mimic_mult = 1, mimic_off = 0;
    // filled by the reduction when this joint becomes a MIMIC_PAIR master
    bool is_pair = false;
    int pair_master_t = -1, pair_mimic_t = -1;
    double pair_mult = 1, pair_off = 0;
    Mat3 R2;
    Vec3 p2;
  };
  std::vector<std::string> links;
  std::vector<JDef> jdefs;
  for (const auto& c : root.children) {
    if (c.tag == "link") {
      auto it = c.attrs.find("name");
      if (it != c.attrs.end()) links.push_back(it->second);
    } else if (c.tag == "joint") {
      JDef j;
      auto a = c.attrs.find("name");
      j.name = a != c.attrs.end() ? a->second : "";
      a = c.attrs.find("type");
      j.type = a != c.attrs.end() ? a->second : "";
      for (const auto& ch : c.children) {
        if (ch.tag == "parent") {
          auto it = ch.attrs.find("link");
          if (it != ch.attrs.end()) j.parent_link = it->second;
        } else if (ch.tag == "child") {
          auto it = ch.attrs.find("link");
          if (it != ch.attrs.end()) j.child_link = it->second;
        } else if (ch.tag == "origin") {
          auto it = ch.attrs.find("xyz");
          if (it != ch.attrs.end()) {
            double v[3];
            parse_doubles(it->second, v, 3);
            j.p = {v[0], v[1], v[2]};
          }
          it = ch.attrs.find("rpy");
          if (it != ch.attrs.end()) {
            double v[3];
            parse_doubles(it->second, v, 3);
            j.R = rpy_to_mat(v[0], v[1], v[2]);
          }
        } else if (ch.tag == "axis") {
          auto it = ch.attrs.find("xyz");
          if (it != ch.attrs.end()) {
            double v[3];
            parse_doubles(it->second, v, 3);
            double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
            if (n > 0) j.axis = {v[0] / n, v[1] / n, v[2] / n};
          }
        } else if (ch.tag == "axis2") {  // universal-joint extension
          auto it = ch.attrs.find("xyz");
          if (it != ch.attrs.end()) {
            double v[3];
            parse_doubles(it->second, v, 3);
            double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
            if (n > 0) j.axis2 = {v[0] / n, v[1] / n, v[2] / n};
          }
        } else if (ch.tag == "limit") {
          auto it = ch.attrs.find("velocity");
          if (it != ch.attrs.end()) j.vel_limit = std::strtod(it->second.c_str(), nullptr);
        } else if (ch.tag == "pitch") {  // helical extension (m per radian)
          auto it = ch.attrs.find("value");
          if (it != ch.attrs.end()) j.pitch = std::strtod(it->second.c_str(), nullptr);
        } else if (ch.tag == "mimic") {
          // q = k * q_master + o coupling: policy applied after all joints
          // are read (reject by default / fold serial pairs when
          // mimic_reduce), mirroring load_urdf's mimic= parameter
          auto it = ch.attrs.find("joint");
          j.has_mimic = true;
          j.mimic_joint = it != ch.attrs.end() ? it->second : "?";
          it = ch.attrs.find("multiplier");
          if (it != ch.attrs.end()) j.mimic_mult = std::strtod(it->second.c_str(), nullptr);
          it = ch.attrs.find("offset");
          if (it != ch.attrs.end()) j.mimic_off = std::strtod(it->second.c_str(), nullptr);
        }
      }
      jdefs.push_back(std::move(j));
    }
  }

  // root-link candidates come from the PRE-merge child set: a mimic merge
  // renames the master's child link, but the original link was still a
  // child and must not surface as a second root (same pre-merge `child_of`
  // bookkeeping as the Python loader)
  std::map<std::string, int> is_child;
  for (const auto& j : jdefs) is_child[j.child_link] = 1;

  // ---- mimic policy (mirrors load_urdf's mimic= parameter) ---------------
  bool any_mimic = false;
  for (const auto& j : jdefs) any_mimic |= j.has_mimic;
  if (any_mimic && !mimic_reduce) {
    for (const auto& j : jdefs)
      if (j.has_mimic) {
        res.error = "joint '" + j.name + "' mimics '" + j.mimic_joint +
                    "': <mimic> couplings are not supported as independent "
                    "dofs; parse with mimic_reduce to fold serial-adjacent "
                    "pairs into one coupled joint, or remove the mimic "
                    "joint from the URDF";
        return res;
      }
  }
  if (any_mimic) {
    // subtree-walk: does joint j0's branch carry any moving joint?
    auto subtree_has_moving = [&](size_t j0) {
      std::vector<size_t> stack{j0};
      while (!stack.empty()) {
        size_t k = stack.back();
        stack.pop_back();
        if (jdefs[k].type != "fixed") return true;
        for (size_t m = 0; m < jdefs.size(); m++)
          if (jdefs[m].parent_link == jdefs[k].child_link) stack.push_back(m);
      }
      return false;
    };
    for (size_t i = 0; i < jdefs.size();) {
      if (!jdefs[i].has_mimic) { i++; continue; }
      JDef jd = jdefs[i];
      int master = -1;
      for (size_t m = 0; m < jdefs.size(); m++)
        if (jdefs[m].name == jd.mimic_joint) master = static_cast<int>(m);
      if (master < 0) {
        res.error = "joint '" + jd.name + "' mimics unknown joint '" +
                    jd.mimic_joint + "'";
        return res;
      }
      JDef& mj = jdefs[master];
      if (mj.has_mimic) {
        res.error = "chained mimic ('" + jd.name + "' mimics mimic-joint '" +
                    mj.name + "') is not supported";
        return res;
      }
      // purely cosmetic fixed frames on the master's child link are allowed
      // (dropped by the traversal); dof-carrying branches block (ADVICE r4)
      std::string blocking;
      for (size_t m = 0; m < jdefs.size(); m++)
        if (m != i && jdefs[m].parent_link == mj.child_link &&
            subtree_has_moving(m)) {
          blocking = jdefs[m].name;
          break;
        }
      if (jd.parent_link != mj.child_link || !blocking.empty()) {
        res.error = "mimic joint '" + jd.name +
                    "' is not serial-adjacent to its master '" + mj.name +
                    "' (it must be the only DOF-carrying joint on the "
                    "master's child link, with no intervening fixed frames"
                    + (blocking.empty() ? "" : "; blocking branch: '" +
                                               blocking + "'") +
                    "): cross-branch couplings cannot be expressed by the "
                    "solver's per-joint variables";
        return res;
      }
      auto is_rp = [](const std::string& t) {
        return t == "revolute" || t == "prismatic";
      };
      if (!is_rp(mj.type) || !is_rp(jd.type)) {
        res.error = "mimic reduction supports revolute/prismatic pairs; got "
                    + mj.type + " -> " + jd.type;
        return res;
      }
      // merge: master becomes a 1-dof MIMIC_PAIR whose FK/S carry the
      // coupling exactly; the mimic joint's origin is the inner placement
      mj.is_pair = true;
      mj.pair_master_t = mj.type == "revolute" ? 0 : 1;
      mj.pair_mimic_t = jd.type == "revolute" ? 0 : 1;
      mj.pair_mult = jd.mimic_mult;
      mj.pair_off = jd.mimic_off;
      mj.R2 = jd.R;
      mj.p2 = jd.p;
      mj.axis2 = jd.axis;
      mj.type = "mimic_pair";
      mj.child_link = jd.child_link;
      double k = jd.mimic_mult;
      if (k != 0) {
        double folded = jd.vel_limit / std::abs(k);
        if (folded < mj.vel_limit) mj.vel_limit = folded;
      }
      jdefs.erase(jdefs.begin() + i);
      // restart: indices shifted
      i = 0;
    }
  }

  // root link: never a child
  std::string root_link;
  int nroots = 0;
  for (const auto& l : links)
    if (!is_child.count(l)) {
      root_link = l;
      nroots++;
    }
  if (nroots != 1) {
    res.error = "expected a single root link, found " + std::to_string(nroots);
    return res;
  }

  std::map<std::string, std::vector<int>> children_of_link;
  for (size_t i = 0; i < jdefs.size(); i++)
    children_of_link[jdefs[i].parent_link].push_back(static_cast<int>(i));
  // stable order by name, matching the Python loader's sorted() traversal
  for (auto& kv : children_of_link) {
    auto& v = kv.second;
    for (size_t i = 1; i < v.size(); i++)
      for (size_t k = i; k > 0 && jdefs[v[k - 1]].name > jdefs[v[k]].name; k--)
        std::swap(v[k - 1], v[k]);
  }

  struct StackItem {
    std::string link;
    int parent_idx;
    Mat3 accR;
    Vec3 accp;
  };
  std::vector<StackItem> stack;
  if (floating_base) {
    JointOut ff;
    ff.parent = -1;
    ff.jtype = 2;
    ff.axis = {0, 0, 1};
    ff.axis2 = {0, 1, 0};
    ff.vel_limit = 1e30;
    ff.name = "root_joint";
    res.joints.push_back(ff);
    stack.push_back({root_link, 0, Mat3{}, Vec3{}});
  } else {
    stack.push_back({root_link, -1, Mat3{}, Vec3{}});
  }

  while (!stack.empty()) {
    StackItem item = stack.back();
    stack.pop_back();
    auto it = children_of_link.find(item.link);
    if (it == children_of_link.end()) continue;
    // indices are assigned at discovery in sorted-sibling order, matching
    // the Python loader (which appends during its sorted() iteration)
    for (auto cit = it->second.begin(); cit != it->second.end(); ++cit) {
      const JDef& j = jdefs[*cit];
      Mat3 R = matmul(item.accR, j.R);
      Vec3 p{item.accp.x + matvec(item.accR, j.p).x,
             item.accp.y + matvec(item.accR, j.p).y,
             item.accp.z + matvec(item.accR, j.p).z};
      if (j.type == "fixed") {
        stack.push_back({j.child_link, item.parent_idx, R, p});
        continue;
      }
      int jtype;
      if (j.type == "revolute") jtype = 0;
      else if (j.type == "continuous") jtype = 4;  // pinocchio nq=2 cos/sin
      else if (j.type == "prismatic") jtype = 1;
      else if (j.type == "floating") jtype = 2;
      else if (j.type == "spherical") jtype = 3;   // extension, like the
                                                   // Python loader
      else if (j.type == "translation") jtype = 5; // extension
      else if (j.type == "planar") jtype = 6;
      else if (j.type == "universal") jtype = 7;   // extension (axis2)
      else if (j.type == "helical") jtype = 8;     // extension (<pitch>)
      else if (j.type == "spherical_zyx") jtype = 9;  // extension
      else if (j.type == "mimic_pair") jtype = 10; // from mimic_reduce
      else {
        res.error = "unsupported joint type " + j.type;
        res.joints.clear();
        return res;
      }
      JointOut out;
      out.parent = item.parent_idx;
      out.jtype = jtype;
      out.R = R;
      out.p = p;
      out.axis = j.axis;
      out.axis2 = j.axis2;
      out.vel_limit = j.vel_limit;
      out.pitch = j.pitch;
      out.pair_master_t = j.pair_master_t;
      out.pair_mimic_t = j.pair_mimic_t;
      out.pair_mult = j.pair_mult;
      out.pair_off = j.pair_off;
      out.R2 = j.R2;
      out.p2 = j.p2;
      out.name = j.name;
      int idx = static_cast<int>(res.joints.size());
      res.joints.push_back(out);
      stack.push_back({j.child_link, idx, Mat3{}, Vec3{}});
    }
  }
  for (const auto& j : res.joints) {
    res.names += j.name;
    res.names += '\n';
  }
  return res;
}

thread_local ParseResult g_result;

}  // namespace

extern "C" {

// Parse URDF text.  Returns number of moving joints, 0 on error (see
// loik_urdf_error).  mimic_reduce selects the <mimic> policy: 0 rejects
// (default parity with load_urdf), nonzero folds serial-adjacent pairs into
// MIMIC_PAIR joints like load_urdf(mimic='reduce').  Results are stored
// thread-locally; fetch with loik_urdf_get before the next parse on the
// same thread.
int loik_urdf_parse(const char* xml, int floating_base, int mimic_reduce) {
  g_result = parse_urdf(xml, floating_base, mimic_reduce);
  return static_cast<int>(g_result.joints.size());
}

const char* loik_urdf_error() { return g_result.error.c_str(); }

// Fill caller-allocated arrays: parents (N i32), jtypes (N i32),
// placement_R (N*9 f64, row-major), placement_p (N*3), axis (N*3),
// vel_limit (N).  Returns 0 on success.
int loik_urdf_get(int* parents, int* jtypes, double* placement_R,
                  double* placement_p, double* axis, double* vel_limit) {
  const auto& js = g_result.joints;
  for (size_t i = 0; i < js.size(); i++) {
    parents[i] = js[i].parent;
    jtypes[i] = js[i].jtype;
    std::memcpy(placement_R + 9 * i, js[i].R.m, 9 * sizeof(double));
    placement_p[3 * i] = js[i].p.x;
    placement_p[3 * i + 1] = js[i].p.y;
    placement_p[3 * i + 2] = js[i].p.z;
    axis[3 * i] = js[i].axis.x;
    axis[3 * i + 1] = js[i].axis.y;
    axis[3 * i + 2] = js[i].axis.z;
    vel_limit[i] = js[i].vel_limit;
  }
  return 0;
}

// Second rotation axes (universal joints; default (0,1,0) elsewhere):
// axis2 (N*3 f64).  Returns 0 on success.
int loik_urdf_get_axis2(double* axis2) {
  const auto& js = g_result.joints;
  for (size_t i = 0; i < js.size(); i++) {
    axis2[3 * i] = js[i].axis2.x;
    axis2[3 * i + 1] = js[i].axis2.y;
    axis2[3 * i + 2] = js[i].axis2.z;
  }
  return 0;
}

// Joint names as a '\n'-joined buffer.
const char* loik_urdf_names() { return g_result.names.c_str(); }

// Extension extras: pitch (N f64, helical screw pitch), mimic_meta (N*4 f64:
// master type code, mimic type code, multiplier, offset — master code -1
// marks a non-pair joint), placement2_R (N*9 f64) and placement2_p (N*3,
// the mimic pair's inner placement; identity elsewhere).  Returns 0.
int loik_urdf_get_extras(double* pitch, double* mimic_meta,
                         double* placement2_R, double* placement2_p) {
  const auto& js = g_result.joints;
  for (size_t i = 0; i < js.size(); i++) {
    pitch[i] = js[i].pitch;
    mimic_meta[4 * i] = js[i].pair_master_t;
    mimic_meta[4 * i + 1] = js[i].pair_mimic_t;
    mimic_meta[4 * i + 2] = js[i].pair_mult;
    mimic_meta[4 * i + 3] = js[i].pair_off;
    std::memcpy(placement2_R + 9 * i, js[i].R2.m, 9 * sizeof(double));
    placement2_p[3 * i] = js[i].p2.x;
    placement2_p[3 * i + 1] = js[i].p2.y;
    placement2_p[3 * i + 2] = js[i].p2.z;
  }
  return 0;
}

}  // extern "C"
