// Standalone engine exerciser — built plain (make test) or instrumented
// (make tsan) to validate the thread pool, episode semantics and backends
// under ThreadSanitizer (the race-detection story of SURVEY.md §5; the
// epoch race fixed in engine.cc was exactly the class of bug this catches).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
void* renv_create(const char* game, int n_envs, uint64_t seed,
                  int max_episode_frames, int n_threads);
void renv_destroy(void* h);
int renv_num_actions(void* h);
void renv_set_training(void* h, int training);
void renv_reset_all(void* h, uint8_t* frames);
void renv_step(void* h, const int32_t* actions, uint8_t* obs,
               uint8_t* reset_frames, float* rewards, uint8_t* dones,
               uint8_t* reset_kinds);
}

int main() {
  const char* games[] = {"pong", "breakout", "space_invaders", "freeway"};
  uint64_t checksum = 0;
  for (int round = 0; round < 2; ++round) {
    for (const char* game : games) {
      const int n = 16;
      void* h = renv_create(game, n, 42 + round, 2000, 4);
      if (!h) { std::fprintf(stderr, "create failed: %s\n", game); return 1; }
      int na = renv_num_actions(h);
      std::vector<uint8_t> obs(n * 84 * 84), resets(n * 84 * 84);
      std::vector<uint8_t> dones(n), kinds(n);
      std::vector<float> rewards(n);
      std::vector<int32_t> actions(n);
      renv_reset_all(h, obs.data());
      renv_set_training(h, round % 2);
      uint64_t rng = 12345 + round;
      for (int t = 0; t < 60; ++t) {
        for (int e = 0; e < n; ++e) {
          rng = rng * 6364136223846793005ULL + 1442695040888963407ULL;
          actions[e] = (int32_t)((rng >> 33) % na);
        }
        renv_step(h, actions.data(), obs.data(), resets.data(),
                  rewards.data(), dones.data(), kinds.data());
        checksum += obs[t % (n * 84 * 84)] + dones[t % n];
      }
      renv_destroy(h);
    }
  }
  std::printf("engine_test OK (checksum %llu)\n",
              (unsigned long long)checksum);
  return 0;
}
