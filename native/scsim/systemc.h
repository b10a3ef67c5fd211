// scsim: a minimal, original SystemC-compatible simulation kernel.
//
// Purpose: build and run the reference's SystemC NGDBF simulator
// (`SystemC/NGDBF/src/ldpcsim.cpp` + headers) WITHOUT an Accellera SystemC
// installation, so `tests/test_reference_parity.py` can cross-validate
// `ldpcsimulation_tpu.decoders.ngdbf_systemc` against the actual compiled
// reference program (VERDICT round-1 missing item #5).
//
// This implements only the subset of IEEE 1666 semantics the reference
// design exercises:
//   * SC_METHOD processes with static sensitivity (value-change on signals
//     reached through ports, and pos-edge on bool ports), all executed once
//     during the initialization phase, exactly like SystemC's default;
//   * two-phase (evaluate/update) delta cycles on sc_signal<T>;
//   * hierarchical port-to-port binding resolved at elaboration end;
//   * a free-running sc_clock driving edge-sensitive processes;
//   * sc_start / sc_stop, sc_vector with creator-functor init.
//
// It is NOT a general SystemC replacement: no SC_THREAD/wait(), no dynamic
// sensitivity, no timed event notification, no resolved signals.  The
// reference design (decoder.h, nodes.h, LDPC_testbench.h) uses none of
// those.
//
// Written from the IEEE 1666 semantics; shares no code with Accellera
// SystemC or the reference's vendored sc_vector.h (which is skipped by
// predefining its include guard SC_VECTOR_H_INCLUDED_ at compile time).

#ifndef SCSIM_SYSTEMC_H_
#define SCSIM_SYSTEMC_H_

#include <cstdio>
#include <cstdlib>
#include <deque>
#include <functional>
#include <string>
#include <vector>

namespace sc_core {

enum sc_time_unit { SC_FS, SC_PS, SC_NS, SC_US, SC_MS, SC_SEC };

enum sc_sens_kind { SCSIM_SENS_VALUE = 0, SCSIM_SENS_POS = 1, SCSIM_SENS_NEG = 2 };

class sc_signal_base;
class sc_port_base;
class sc_clock;

// ---------------------------------------------------------------------
// Simulation context (singleton): process table, delta queues, clocks.
// ---------------------------------------------------------------------
class sc_simcontext {
 public:
  struct Proc {
    std::function<void()> fn;
    bool queued = false;
  };
  struct PendingSens {
    size_t proc;
    sc_port_base* port;
    int kind;
  };

  std::vector<Proc> procs;
  std::deque<size_t> runq;
  std::vector<sc_signal_base*> update_q;
  std::vector<sc_clock*> clocks;
  std::vector<PendingSens> pending_sens;
  std::vector<std::function<void()>> port_initializers;
  size_t current_proc_decl = static_cast<size_t>(-1);
  bool stop_requested = false;

  static sc_simcontext& get() {
    static sc_simcontext ctx;
    return ctx;
  }

  void make_runnable(size_t p) {
    if (!procs[p].queued) {
      procs[p].queued = true;
      runq.push_back(p);
    }
  }
};

// ---------------------------------------------------------------------
// Signals: current/next value, update phase fires sensitive processes.
// ---------------------------------------------------------------------
class sc_signal_base {
 public:
  virtual ~sc_signal_base() = default;
  virtual void update_() = 0;

  void subscribe_(size_t proc, int kind) { hooks_.push_back({proc, kind}); }

 protected:
  struct Hook {
    size_t proc;
    int kind;
  };
  std::vector<Hook> hooks_;
  bool in_update_q_ = false;

  void fire_(bool rising, bool falling) {
    auto& ctx = sc_simcontext::get();
    for (const Hook& h : hooks_) {
      if (h.kind == SCSIM_SENS_VALUE || (h.kind == SCSIM_SENS_POS && rising) ||
          (h.kind == SCSIM_SENS_NEG && falling))
        ctx.make_runnable(h.proc);
    }
  }

  void enqueue_update_() {
    if (!in_update_q_) {
      in_update_q_ = true;
      sc_simcontext::get().update_q.push_back(this);
    }
  }

  friend class sc_clock;
};

template <class T>
class sc_signal : public sc_signal_base {
 public:
  sc_signal() : cur_(T()), next_(T()) {}
  explicit sc_signal(const char*) : cur_(T()), next_(T()) {}
  sc_signal(const sc_signal&) = delete;
  sc_signal& operator=(const sc_signal&) = delete;

  const T& read() const { return cur_; }
  operator const T&() const { return cur_; }

  void write(const T& v) {
    next_ = v;
    pending_ = true;
    enqueue_update_();
  }

  // Immediate assignment used for elaboration-time port initialize().
  void set_now_(const T& v) {
    cur_ = v;
    next_ = v;
  }

  void update_() override {
    in_update_q_ = false;
    if (!pending_) return;
    pending_ = false;
    if (!(next_ == cur_)) {
      bool rising = false, falling = false;
      edge_detect_(cur_, next_, rising, falling);
      cur_ = next_;
      fire_(rising, falling);
    }
  }

 private:
  static void edge_detect_(const T&, const T&, bool&, bool&) {}

  T cur_, next_;
  bool pending_ = false;
};

template <>
inline void sc_signal<bool>::edge_detect_(const bool& oldv, const bool& newv,
                                          bool& rising, bool& falling) {
  rising = !oldv && newv;
  falling = oldv && !newv;
}

// ---------------------------------------------------------------------
// Clock: a bool signal toggled directly by the scheduler between deltas.
// ---------------------------------------------------------------------
class sc_clock : public sc_signal<bool> {
 public:
  sc_clock(const char*, double /*period*/, sc_time_unit) {
    sc_simcontext::get().clocks.push_back(this);
  }

  void toggle_() {
    bool n = !read();
    set_now_(n);
    fire_(n, !n);
  }
};

// ---------------------------------------------------------------------
// Ports: bind to a signal or hierarchically to a parent port; resolved
// lazily (binding happens in arbitrary order during elaboration).
// ---------------------------------------------------------------------
class sc_port_base {
 public:
  virtual ~sc_port_base() = default;
  virtual sc_signal_base* resolve_base_() = 0;
};

struct sc_event_ref {
  sc_port_base* port;
  int kind;
};

template <class T>
class sc_port_T : public sc_port_base {
 public:
  sc_port_T() = default;
  explicit sc_port_T(const char*) {}
  sc_port_T(const sc_port_T&) = delete;
  sc_port_T& operator=(const sc_port_T&) = delete;

  void bind(sc_signal<T>& s) {
    sig_ = &s;
    parent_ = nullptr;
  }
  void bind(sc_port_T<T>& p) {
    parent_ = &p;
    sig_ = nullptr;
  }
  void operator()(sc_signal<T>& s) { bind(s); }
  void operator()(sc_port_T<T>& p) { bind(p); }

  sc_signal<T>* resolve_() const {
    const sc_port_T<T>* p = this;
    int guard = 0;
    while (p->parent_ != nullptr && guard++ < 64) p = p->parent_;
    return p->sig_;
  }
  sc_signal_base* resolve_base_() override { return resolve_(); }

  const T& read() const {
    sc_signal<T>* s = resolve_();
    if (s == nullptr) {
      std::fprintf(stderr, "scsim: read() on unbound port\n");
      std::exit(1);
    }
    return s->read();
  }
  operator const T&() const { return read(); }

  sc_event_ref pos() { return {this, SCSIM_SENS_POS}; }
  sc_event_ref neg() { return {this, SCSIM_SENS_NEG}; }

 private:
  sc_signal<T>* sig_ = nullptr;
  sc_port_T<T>* parent_ = nullptr;
};

template <class T>
class sc_in : public sc_port_T<T> {
 public:
  sc_in() = default;
  explicit sc_in(const char* nm) : sc_port_T<T>(nm) {}
};

template <class T>
class sc_out : public sc_port_T<T> {
 public:
  sc_out() = default;
  explicit sc_out(const char* nm) : sc_port_T<T>(nm) {}

  void write(const T& v) {
    sc_signal<T>* s = this->resolve_();
    if (s == nullptr) {
      std::fprintf(stderr, "scsim: write() on unbound port\n");
      std::exit(1);
    }
    s->write(v);
  }

  // Deferred: the port may not be bound yet when initialize() is called
  // in a module constructor; applied at elaboration end.
  void initialize(const T& v) {
    sc_port_T<T>* self = this;
    sc_simcontext::get().port_initializers.push_back([self, v]() {
      sc_signal<T>* s = self->resolve_();
      if (s != nullptr) s->set_now_(v);
    });
  }
};

// ---------------------------------------------------------------------
// Modules, processes and static sensitivity.
// ---------------------------------------------------------------------
class sc_module_name {
 public:
  sc_module_name(const char* n) : n_(n) {}  // NOLINT: implicit by design
  operator const char*() const { return n_; }

 private:
  const char* n_;
};

class sc_sensitive {
 public:
  sc_sensitive& operator<<(sc_event_ref e) {
    reg_(e.port, e.kind);
    return *this;
  }
  template <class T>
  sc_sensitive& operator<<(sc_port_T<T>& p) {
    reg_(&p, SCSIM_SENS_VALUE);
    return *this;
  }
  template <class T>
  sc_sensitive& operator<<(sc_signal<T>& s) {
    auto& ctx = sc_simcontext::get();
    s.subscribe_(ctx.current_proc_decl, SCSIM_SENS_VALUE);
    return *this;
  }

 private:
  void reg_(sc_port_base* p, int kind) {
    auto& ctx = sc_simcontext::get();
    ctx.pending_sens.push_back({ctx.current_proc_decl, p, kind});
  }
};

class sc_module {
 public:
  sc_sensitive sensitive;

  sc_module() = default;
  explicit sc_module(sc_module_name) {}
  virtual ~sc_module() = default;
  sc_module(const sc_module&) = delete;
  sc_module& operator=(const sc_module&) = delete;

 protected:
  void scsim_register_method_(std::function<void()> fn) {
    auto& ctx = sc_simcontext::get();
    ctx.procs.push_back({std::move(fn), false});
    ctx.current_proc_decl = ctx.procs.size() - 1;
  }
};

#define SC_HAS_PROCESS(cls)
#define SC_METHOD(func) \
  this->scsim_register_method_([this]() { this->func(); })

// ---------------------------------------------------------------------
// sc_vector: owning vector of named elements; creator-functor init.
// ---------------------------------------------------------------------
template <class T>
class sc_vector {
 public:
  sc_vector() = default;
  explicit sc_vector(const char* nm) : name_(nm) {}
  sc_vector(const char* nm, size_t n) : name_(nm) { init(n); }
  sc_vector(const sc_vector&) = delete;
  sc_vector& operator=(const sc_vector&) = delete;
  ~sc_vector() {
    for (T* p : items_) delete p;
  }

  void init(size_t n) {
    for (size_t i = 0; i < n; ++i)
      items_.push_back(new T(elt_name_(i).c_str()));
  }
  template <class Creator>
  void init(size_t n, Creator make) {
    for (size_t i = 0; i < n; ++i)
      items_.push_back(make(elt_name_(i).c_str(), i));
  }

  T& operator[](size_t i) { return *items_[i]; }
  const T& operator[](size_t i) const { return *items_[i]; }
  size_t size() const { return items_.size(); }

 private:
  std::string elt_name_(size_t i) const {
    return name_ + "_" + std::to_string(i);
  }

  std::vector<T*> items_;
  std::string name_;
};

// ---------------------------------------------------------------------
// Scheduler: init phase, delta cycles, clock advance, sc_stop.
// ---------------------------------------------------------------------
inline void sc_stop() { sc_simcontext::get().stop_requested = true; }

inline void sc_start() {
  auto& ctx = sc_simcontext::get();

  // End of elaboration: resolve static sensitivity through port chains,
  // then apply deferred sc_out initialize() values.
  for (const auto& ps : ctx.pending_sens) {
    sc_signal_base* s = ps.port->resolve_base_();
    if (s == nullptr) {
      std::fprintf(stderr, "scsim: sensitivity on unbound port\n");
      std::exit(1);
    }
    s->subscribe_(ps.proc, ps.kind);
  }
  ctx.pending_sens.clear();
  for (const auto& f : ctx.port_initializers) f();
  ctx.port_initializers.clear();

  // Initialization phase: every SC_METHOD runs once (SystemC default).
  for (size_t i = 0; i < ctx.procs.size(); ++i) ctx.make_runnable(i);

  long long max_toggles = -1;
  if (const char* env = std::getenv("SCSIM_MAX_CYCLES"))
    max_toggles = std::atoll(env) * 2;  // cycles -> clock edges
  long long toggles = 0;

  while (!ctx.stop_requested) {
    // Delta cycles: evaluate all runnable, then update written signals.
    while (!ctx.runq.empty() && !ctx.stop_requested) {
      std::deque<size_t> q;
      q.swap(ctx.runq);
      for (size_t p : q) {
        ctx.procs[p].queued = false;
        ctx.procs[p].fn();
      }
      std::vector<sc_signal_base*> uq;
      uq.swap(ctx.update_q);
      for (sc_signal_base* s : uq) s->update_();
    }
    if (ctx.stop_requested || ctx.clocks.empty()) break;
    for (sc_clock* c : ctx.clocks) c->toggle_();
    if (max_toggles > 0 && ++toggles >= max_toggles) {
      std::fprintf(stderr, "scsim: SCSIM_MAX_CYCLES reached, stopping\n");
      break;
    }
  }
}

}  // namespace sc_core

using namespace sc_core;  // NOLINT: mirrors Accellera's systemc.h

extern int sc_main(int argc, char* argv[]);

#endif  // SCSIM_SYSTEMC_H_
