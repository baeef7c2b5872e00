// UDP datagram transport with a small handle table.
// Mirrors the behavior of CommonLibs/Sockets.cpp (UDPSocket: bind local
// port, fixed remote destination, blocking reads with timeout via
// select) without the C++ class surface.
#include "runtime.h"

#include <arpa/inet.h>
#include <cstring>
#include <mutex>
#include <netdb.h>
#include <sys/select.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

namespace {

struct Conn {
  int fd = -1;
  sockaddr_storage remote{};
  socklen_t remote_len = 0;
  bool used = false;
};

constexpr int kMax = 64;
Conn g_conns[kMax];
std::mutex g_lock;

}  // namespace

extern "C" int udt_open(int local_port, const char *remote_host,
                        int remote_port) {
  int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in local{};
  local.sin_family = AF_INET;
  local.sin_addr.s_addr = htonl(INADDR_ANY);
  local.sin_port = htons((uint16_t)local_port);
  if (::bind(fd, (sockaddr *)&local, sizeof(local)) < 0) {
    ::close(fd);
    return -1;
  }
  sockaddr_in remote{};
  remote.sin_family = AF_INET;
  remote.sin_port = htons((uint16_t)remote_port);
  if (remote_host && remote_host[0]) {
    hostent *he = ::gethostbyname(remote_host);
    if (!he) {
      ::close(fd);
      return -1;
    }
    std::memcpy(&remote.sin_addr, he->h_addr_list[0], he->h_length);
  }
  std::lock_guard<std::mutex> g(g_lock);
  for (int i = 0; i < kMax; i++) {
    if (!g_conns[i].used) {
      g_conns[i].fd = fd;
      std::memcpy(&g_conns[i].remote, &remote, sizeof(remote));
      g_conns[i].remote_len = sizeof(remote);
      g_conns[i].used = true;
      return i;
    }
  }
  ::close(fd);
  return -1;
}

// Unix-domain datagram variant (CommonLibs UDDSocket, Sockets.h:157).
extern "C" int udt_open_unix(const char *local_path,
                             const char *remote_path) {
  int fd = ::socket(AF_UNIX, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  sockaddr_un local{};
  local.sun_family = AF_UNIX;
  std::strncpy(local.sun_path, local_path, sizeof(local.sun_path) - 1);
  ::unlink(local_path);
  if (::bind(fd, (sockaddr *)&local, sizeof(local)) < 0) {
    ::close(fd);
    return -1;
  }
  sockaddr_un remote{};
  remote.sun_family = AF_UNIX;
  if (remote_path && remote_path[0])
    std::strncpy(remote.sun_path, remote_path, sizeof(remote.sun_path) - 1);
  std::lock_guard<std::mutex> g(g_lock);
  for (int i = 0; i < kMax; i++) {
    if (!g_conns[i].used) {
      g_conns[i].fd = fd;
      std::memcpy(&g_conns[i].remote, &remote, sizeof(remote));
      g_conns[i].remote_len = sizeof(remote);
      g_conns[i].used = true;
      return i;
    }
  }
  ::close(fd);
  return -1;
}

extern "C" int udt_send(int h, const void *buf, int len) {
  if (h < 0 || h >= kMax || !g_conns[h].used) return -1;
  return (int)::sendto(g_conns[h].fd, buf, (size_t)len, 0,
                       (sockaddr *)&g_conns[h].remote,
                       g_conns[h].remote_len);
}

extern "C" int udt_recv(int h, void *buf, int maxlen, int timeout_ms) {
  if (h < 0 || h >= kMax || !g_conns[h].used) return -1;
  int fd = g_conns[h].fd;
  if (timeout_ms >= 0) {
    fd_set rd;
    FD_ZERO(&rd);
    FD_SET(fd, &rd);
    timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
    int rc = ::select(fd + 1, &rd, nullptr, nullptr, &tv);
    if (rc == 0) return 0;   // timeout
    if (rc < 0) return -1;
  }
  ssize_t n = ::recv(fd, buf, (size_t)maxlen, 0);
  return (int)n;
}

extern "C" void udt_close(int h) {
  std::lock_guard<std::mutex> g(g_lock);
  if (h >= 0 && h < kMax && g_conns[h].used) {
    ::close(g_conns[h].fd);
    g_conns[h].used = false;
  }
}
