// ARPA word n-gram language model with Katz back-off, plus the LM-fused
// CTC prefix beam search (native replacement for the reference's
// ctcdecode + KenLM stack, recognition_model.py:6,34-35: alpha/beta
// word-insertion fusion at word boundaries).
//
// C ABI:
//   ssp_lm_load(path) -> handle (0 on failure)
//   ssp_lm_free(handle)
//   ssp_lm_score_word(handle, context_utf8, word_utf8) -> natural-log prob
//   ssp_ctc_beam_decode_lm(handle, log_probs, T, K, blank, beam_width,
//                          prune_logp, alpha, beta, charset_utf8,
//                          out_ids, out_cap) -> decoded length

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();
constexpr double kLog10 = 2.302585092994046;

double LogSumExp2(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct ArpaLM {
  // per order: "w1 w2 ... wn" -> (logp_e, backoff_e)  (natural log)
  std::vector<std::unordered_map<std::string, std::pair<float, float>>>
      ngrams;
  int order = 0;
  double unk_floor = -10.0 * kLog10;

  bool Load(const std::string& path) {
    std::ifstream f(path);
    if (!f.is_open()) return false;
    std::string line;
    int section = 0;
    while (std::getline(f, line)) {
      // trim
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n'
                               || line.back() == ' '))
        line.pop_back();
      if (line.empty()) continue;
      if (line[0] == '\\') {
        if (line == "\\end\\") break;
        size_t dash = line.find("-grams:");
        if (dash != std::string::npos) {
          section = std::stoi(line.substr(1, dash - 1));
          order = std::max(order, section);
          if ((int)ngrams.size() < section + 1) ngrams.resize(section + 1);
        }
        continue;
      }
      if (section == 0) continue;
      std::istringstream ss(line);
      double logp;
      if (!(ss >> logp)) continue;
      std::string words, w;
      for (int i = 0; i < section; i++) {
        if (!(ss >> w)) { words.clear(); break; }
        if (i) words += ' ';
        words += w;
      }
      if (words.empty()) continue;
      double backoff = 0.0;
      ss >> backoff;  // optional
      ngrams[section][words] = {float(logp * kLog10),
                                float(backoff * kLog10)};
    }
    return order > 0;
  }

  static std::string Join(const std::vector<std::string>& ws, size_t lo) {
    std::string out;
    for (size_t i = lo; i < ws.size(); i++) {
      if (i > lo) out += ' ';
      out += ws[i];
    }
    return out;
  }

  double ScoreWord(std::vector<std::string> context,
                   const std::string& word) const {
    // truncate to the model order's context window
    if (order > 1 && (int)context.size() > order - 1) {
      context.erase(context.begin(), context.end() - (order - 1));
    } else if (order <= 1) {
      context.clear();
    }
    // Katz back-off: direct hit, else backoff(context) + shorter context
    double backoff_acc = 0.0;
    while (true) {
      std::string key = Join(context, 0);
      if (!key.empty()) key += ' ';
      key += word;
      int n = (int)context.size() + 1;
      if (n < (int)ngrams.size()) {
        auto it = ngrams[n].find(key);
        if (it != ngrams[n].end()) return backoff_acc + it->second.first;
      }
      if (context.empty()) {
        if (1 < (int)ngrams.size()) {
          auto unk = ngrams[1].find("<unk>");
          if (unk != ngrams[1].end()) return backoff_acc
              + unk->second.first;
        }
        return backoff_acc + unk_floor;
      }
      int cn = (int)context.size();
      if (cn < (int)ngrams.size()) {
        auto it = ngrams[cn].find(Join(context, 0));
        if (it != ngrams[cn].end()) backoff_acc += it->second.second;
      }
      context.erase(context.begin());
    }
  }
};

struct LMBeam {
  double p_blank = kNegInf;
  double p_nonblank = kNegInf;
  std::vector<std::string> words;  // completed words (context)
  std::string cur;                 // word in progress
  double Total() const { return LogSumExp2(p_blank, p_nonblank); }
};

struct VecHashLM {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int32_t x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull + (h << 6)
           + (h >> 2);
    }
    return h;
  }
};

}  // namespace

extern "C" {

int64_t ssp_lm_load(const char* path) {
  auto lm = std::make_unique<ArpaLM>();
  if (!lm->Load(path)) return 0;
  return reinterpret_cast<int64_t>(lm.release());
}

void ssp_lm_free(int64_t handle) {
  delete reinterpret_cast<ArpaLM*>(handle);
}

double ssp_lm_score_word(int64_t handle, const char* context,
                         const char* word) {
  const ArpaLM* lm = reinterpret_cast<const ArpaLM*>(handle);
  std::vector<std::string> ctx;
  std::istringstream ss(context);
  std::string w;
  while (ss >> w) ctx.push_back(w);
  return lm->ScoreWord(ctx, word);
}

int32_t ssp_ctc_beam_decode_lm(int64_t handle, const double* log_probs,
                               int32_t T, int32_t K, int32_t blank,
                               int32_t beam_width, double prune_logp,
                               double alpha, double beta,
                               const char* charset, int32_t* out_ids,
                               int32_t out_cap) {
  const ArpaLM* lm = reinterpret_cast<const ArpaLM*>(handle);
  const std::string chars(charset);
  int32_t space_id = -1;
  for (size_t i = 0; i < chars.size(); i++) {
    if (chars[i] == ' ') space_id = (int32_t)i;
  }

  auto word_bonus = [&](const std::vector<std::string>& words,
                        const std::string& cur) -> double {
    if (cur.empty()) return 0.0;
    if (lm == nullptr) return beta;
    std::vector<std::string> ctx;
    ctx.push_back("<s>");
    for (const auto& w : words) ctx.push_back(w);
    return alpha * lm->ScoreWord(ctx, cur) + beta;
  };

  using BeamMap = std::unordered_map<std::vector<int32_t>, LMBeam,
                                     VecHashLM>;
  BeamMap beams;
  beams[{}] = LMBeam{0.0, kNegInf, {}, ""};

  std::vector<int32_t> cand;
  for (int32_t t = 0; t < T; t++) {
    const double* frame = log_probs + (int64_t)t * K;
    double fmax = kNegInf;
    for (int32_t s = 0; s < K; s++) fmax = std::max(fmax, frame[s]);
    cand.clear();
    for (int32_t s = 0; s < K; s++) {
      if (frame[s] >= fmax + prune_logp) cand.push_back(s);
    }

    BeamMap next;
    for (const auto& [prefix, beam] : beams) {
      double p_total = beam.Total();
      int32_t last = prefix.empty() ? -1 : prefix.back();
      for (int32_t s : cand) {
        double p = frame[s];
        if (s == blank) {
          auto& nb = next[prefix];
          if (nb.p_blank == kNegInf && nb.p_nonblank == kNegInf) {
            nb.words = beam.words; nb.cur = beam.cur;
          }
          nb.p_blank = LogSumExp2(nb.p_blank, p_total + p);
          continue;
        }
        if (s == last) {
          auto& stay = next[prefix];
          if (stay.p_blank == kNegInf && stay.p_nonblank == kNegInf) {
            stay.words = beam.words; stay.cur = beam.cur;
          }
          stay.p_nonblank = LogSumExp2(stay.p_nonblank,
                                       beam.p_nonblank + p);
          std::vector<int32_t> ext = prefix;
          ext.push_back(s);
          auto& nb = next[ext];
          if (nb.p_blank == kNegInf && nb.p_nonblank == kNegInf) {
            nb.words = beam.words;
            nb.cur = beam.cur + chars[s];
          }
          nb.p_nonblank = LogSumExp2(nb.p_nonblank, beam.p_blank + p);
        } else {
          std::vector<int32_t> ext = prefix;
          ext.push_back(s);
          auto& nb = next[ext];
          double add = p_total + p;
          if (s == space_id) {
            add += word_bonus(beam.words, beam.cur);
            if (nb.p_blank == kNegInf && nb.p_nonblank == kNegInf) {
              nb.words = beam.words;
              if (!beam.cur.empty()) nb.words.push_back(beam.cur);
              nb.cur.clear();
            }
          } else if (nb.p_blank == kNegInf && nb.p_nonblank == kNegInf) {
            nb.words = beam.words;
            nb.cur = beam.cur + chars[s];
          }
          nb.p_nonblank = LogSumExp2(nb.p_nonblank, add);
        }
      }
    }

    std::vector<std::pair<double, const std::vector<int32_t>*>> scored;
    scored.reserve(next.size());
    for (const auto& [prefix, beam] : next) {
      scored.emplace_back(beam.Total(), &prefix);
    }
    size_t keep = std::min<size_t>(beam_width, scored.size());
    std::partial_sort(scored.begin(), scored.begin() + keep, scored.end(),
                      [](const auto& a, const auto& b) {
                        return a.first > b.first;
                      });
    BeamMap pruned;
    for (size_t i = 0; i < keep; i++) {
      pruned[*scored[i].second] = next[*scored[i].second];
    }
    beams = std::move(pruned);
  }

  const std::vector<int32_t>* best = nullptr;
  double best_score = kNegInf;
  for (const auto& [prefix, beam] : beams) {
    double s = beam.Total() + word_bonus(beam.words, beam.cur);
    if (s > best_score) {
      best_score = s;
      best = &prefix;
    }
  }
  if (!best) return 0;
  int32_t n = std::min<int32_t>((int32_t)best->size(), out_cap);
  std::memcpy(out_ids, best->data(), n * sizeof(int32_t));
  return n;
}

}  // extern "C"
